"""Property-based hostile-input tests for the reffile codec.

The pure-Python reader behind the Data Source (operators/reffile_source.
read_ref_file) faces untrusted bytes at the trust boundary: a corrupted
or truncated file must fail with a clean exception — never hang, never
crash the worker with something unhandleable, and NEVER silently return
wrong plaintext for an authenticated (AES-GCM) column. Parity target:
the reference reader's own failure behavior (src/parquet_reader.cpp —
decrypt failures surface, they don't fabricate data).
"""

from __future__ import annotations

import json
import struct

import pytest
from cryptography.exceptions import InvalidTag
from cryptography.hazmat.primitives.ciphers.aead import AESGCM
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from project_final_parquet_spark.operators.reffile_source import (
    read_ref_file,
)

_MASTER = "00112233445566778899aabbccddeeff" * 2
_COL_KEY = bytes(range(32))
_WRAPPED = bytes(b ^ 0xAA for b in _COL_KEY).hex()  # KMS XOR-0xAA stub

# Exceptions a hostile file may legitimately surface. Anything else
# (e.g. MemoryError from a crafted length, an infinite loop) is a bug.
_CLEAN = (
    InvalidTag,  # AES-GCM auth failure — the designed loud failure
    ValueError,
    KeyError,
    IndexError,
    TypeError,
    struct.error,
    json.JSONDecodeError,
    UnicodeDecodeError,
    OverflowError,
)


def _gcm(key: bytes, plain: bytes) -> bytes:
    iv = b"\x07" * 12
    return iv + AESGCM(key).encrypt(iv, plain, None)


def _valid_file() -> bytes:
    """Two-column fixture: one KMS-wrapped AES-GCM column, one
    plaintext column — both decrypt paths exercised."""
    rows = ["alpha", "beta", "gamma"]
    enc_plain = "".join(f"secret: {v}\n" for v in rows).encode()
    enc_blob = _gcm(_COL_KEY, enc_plain)
    open_blob = "".join(f"open: {v}\n" for v in rows).encode()
    body = enc_blob + open_blob
    footer = json.dumps(
        {
            "row_count": len(rows),
            "columns": {
                "secret": {
                    "mode": "AES_GCM",
                    "key_type": "kms",
                    "kms_encrypted_key": _WRAPPED,
                    "offset": 0,
                    "size": len(enc_blob),
                },
                "open": {
                    "mode": "PLAINTEXT",
                    "key_type": "none",
                    "offset": len(enc_blob),
                    "size": len(open_blob),
                },
            },
        }
    ).encode()
    enc_footer = _gcm(bytes.fromhex(_MASTER), footer)
    return body + enc_footer + struct.pack("<Q", len(enc_footer))


_VALID = _valid_file()


def _read(data: bytes, tmp_path, **opts):
    p = tmp_path / "fuzz.ref"
    p.write_bytes(data)
    return read_ref_file(str(p), {"master_key_hex": _MASTER, **opts})


def test_fixture_is_valid(tmp_path):
    cols, values = _read(_VALID, tmp_path)
    assert cols == ["open", "secret"]
    assert values[1] == ["alpha", "beta", "gamma"]


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pos=st.integers(min_value=0, max_value=len(_VALID) - 1),
    flip=st.integers(min_value=1, max_value=255),
)
def test_single_byte_flip_never_escapes_dirty(pos, flip, tmp_path):
    """Any single-byte corruption either still reads (flip landed in a
    plaintext blob — unauthenticated by design, like the reference's
    PLAINTEXT mode) or raises a clean exception. A flip inside the
    AES-GCM ciphertext/footer MUST raise (tag auth), never yield
    altered secret values."""
    data = bytearray(_VALID)
    data[pos] ^= flip
    try:
        cols, values = _read(bytes(data), tmp_path)
    except _CLEAN:
        return
    assert cols == ["open", "secret"]
    # authenticated column is bit-exact or absent — never silently wrong
    assert values[1] == ["alpha", "beta", "gamma"]


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cut=st.integers(min_value=0, max_value=len(_VALID) - 1))
def test_truncation_raises_clean(cut, tmp_path):
    """A prefix of a valid file is never a valid file (the footer
    trailer is load-bearing): every truncation point must raise."""
    with pytest.raises(_CLEAN):
        _read(_VALID[:cut], tmp_path)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.binary(min_size=0, max_size=200))
def test_arbitrary_bytes_raise_clean(data, tmp_path):
    with pytest.raises(_CLEAN):
        _read(data, tmp_path)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    offset=st.integers(min_value=-(2**40), max_value=2**40),
    size=st.integers(min_value=-(2**40), max_value=2**40),
)
def test_hostile_footer_offsets_bounded(offset, size, tmp_path):
    """A crafted footer pointing outside the file (huge/negative
    offset/size) must fail cleanly or mask — a hostile manifest must
    not make the reader allocate unboundedly or return garbage rows."""
    footer = json.dumps(
        {
            "row_count": 3,
            "columns": {
                "open": {
                    "mode": "PLAINTEXT",
                    "key_type": "none",
                    "offset": offset,
                    "size": size,
                }
            },
        }
    ).encode()
    enc_footer = _gcm(bytes.fromhex(_MASTER), footer)
    data = b"open: x\n" * 3 + enc_footer + struct.pack("<Q", len(enc_footer))
    try:
        cols, values = _read(data, tmp_path)
    except _CLEAN:
        return
    assert cols == ["open"]
    assert all(len(v) == 3 for v in values)
