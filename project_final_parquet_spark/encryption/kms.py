"""Mock KMS implementing the reference's envelope-encryption contract
(/root/reference/src/kms.cpp:8-30): ``GenerateDataKey`` returns a fresh
plaintext data key plus a wrapped blob (only the wrapped blob is ever
persisted, in the footer), and ``DecryptDataKey`` unwraps it.

The reference's stub wraps by XOR with a constant; what matters is the
*contract* (SURVEY.md §1.5), so this stub wraps by XOR with a key stream
derived deterministically from ``kms_key_id`` via SHA-256 — same shape,
no shared constants, still obviously not real crypto.
"""

from __future__ import annotations

import hashlib
import os


class MockKMS:
    """Simulated key-management service (envelope encryption)."""

    DATA_KEY_LEN = 16

    def _key_stream(self, kms_key_id: str, n: int) -> bytes:
        out = b""
        counter = 0
        while len(out) < n:
            out += hashlib.sha256(f"{kms_key_id}:{counter}".encode()).digest()
            counter += 1
        return out[:n]

    def generate_data_key(self, kms_key_id: str) -> tuple[bytes, bytes]:
        """Return (plaintext_data_key, wrapped_key_blob).

        Callers persist ONLY the wrapped blob (reference: footer
        ``kms_encrypted_key``, src/parquet_writer.cpp:109-120).
        """
        plain = os.urandom(self.DATA_KEY_LEN)
        stream = self._key_stream(kms_key_id, len(plain))
        wrapped = bytes(a ^ b for a, b in zip(plain, stream))
        return plain, wrapped

    def decrypt_data_key(self, wrapped: bytes, kms_key_id: str) -> bytes:
        """Unwrap a footer blob back to the plaintext data key
        (reference: src/parquet_reader.cpp:127-132)."""
        stream = self._key_stream(kms_key_id, len(wrapped))
        return bytes(a ^ b for a, b in zip(wrapped, stream))
