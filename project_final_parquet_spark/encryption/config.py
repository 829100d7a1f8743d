"""Encryption configuration (reference parity:
/root/reference/include/parquet_encryption_config.hpp:8-22 — mode,
per-column hex keys, master/footer key, fallback key, KMS switches).

Only AES-GCM is supported: in the reference every non-GCM path throws
(src/crypto_utils.cpp:53,101), making CTR/NONE dead code (SURVEY.md §1.6).
"""

from __future__ import annotations

from dataclasses import dataclass, field

VALID_KEY_LENGTHS = (16, 24, 32)  # bytes — reference src/parquet_writer.cpp:22-24


def is_valid_aes_key_hex(hex_key: str) -> bool:
    """Key-length validation (16/24/32 bytes after hex decode)."""
    try:
        raw = bytes.fromhex(hex_key)
    except ValueError:
        return False
    return len(raw) in VALID_KEY_LENGTHS


@dataclass
class EncryptionConfig:
    """Mirrors the reference's ParquetEncryptionConfig contract.

    ``column_keys`` maps column name → hex AES key. ``master_key_hex``
    encrypts the footer. Columns without a key fall through the cascade:
    KMS envelope key (if ``use_kms``) → ``fallback_key_hex`` → plaintext.
    """

    column_keys: dict[str, str] = field(default_factory=dict)
    master_key_hex: str = ""
    fallback_key_hex: str | None = None
    use_kms: bool = False
    kms_key_id: str = ""
    mode: str = "GCM"

    def __post_init__(self) -> None:
        if self.mode != "GCM":
            raise ValueError(
                f"unsupported mode {self.mode!r}: only AES-GCM is real in the "
                "reference (src/crypto_utils.cpp:53,101)"
            )
        if self.master_key_hex and not is_valid_aes_key_hex(self.master_key_hex):
            raise ValueError("master key must be 16/24/32 bytes of hex")
