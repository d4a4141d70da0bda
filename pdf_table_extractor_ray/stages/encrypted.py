"""Encrypted-payload seam (S6).

The reference opens password-protected PDFs before parsing
(conversor_c6.py:36,109 — pikepdf ``open(password=...)`` then the
normal pipeline). The engine covers BOTH shapes:

- **Real PDF encryption** (round 5): payloads that are
  ``%PDF-…/Encrypt`` documents decrypt through the spec standard
  security handler in ``stages/pdf_crypt.py`` — RC4 and AES-128-CBC
  (/AESV2) with Algorithm 2–6 key derivation, exactly what pikepdf
  does for the reference — then route through normal detection.
- **Opaque envelope encryption**: payloads carrying the ``XENC1``
  magic are a deterministic XOR keystream (sha256-counter) with a
  plaintext crc32 — the KMS-envelope stand-in for NON-PDF payloads
  (real envelope crypto would be a KMS call behind the same seam).

Either way the credential comes from the job's ``StrategyConfig``
(reaches every warm actor via ``fn_constructor_kwargs``) and
wrong/missing passwords surface as in-band row errors, never job
failures.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

MAGIC = b"XENC1\x00"
_HEADER_LEN = len(MAGIC) + 4  # magic + crc32(plaintext)


class WrongPassword(ValueError):
    pass


def _keystream(password: str, n: int) -> bytes:
    seed = password.encode()
    blocks = (n + 31) // 32
    return b"".join(
        hashlib.sha256(seed + counter.to_bytes(8, "big")).digest() for counter in range(blocks)
    )[:n]


def _xor(data: bytes, ks: bytes) -> bytes:
    # One vectorized uint8 XOR — a per-byte Python loop here costs ~100×
    # on MB-scale payloads in the flagship hot path.
    return (
        np.frombuffer(data, dtype=np.uint8) ^ np.frombuffer(ks, dtype=np.uint8)
    ).tobytes()


def is_encrypted(payload) -> bool:
    if isinstance(payload, (bytes, bytearray, memoryview)):
        return bytes(payload[: len(MAGIC)]) == MAGIC
    return False


def encrypt_payload(plain: bytes, password: str) -> bytes:
    cipher = _xor(plain, _keystream(password, len(plain)))
    return MAGIC + zlib.crc32(plain).to_bytes(4, "big") + cipher


def decrypt_payload(payload: bytes, password: str | None) -> bytes:
    """Plaintext bytes, or raise: ``WrongPassword`` on a bad/missing
    credential, ``ValueError`` on a non-encrypted payload. Dispatches
    on shape: ``%PDF`` → the real standard-security-handler decrypt
    (``pdf_crypt``), ``XENC1`` → the envelope XOR scheme."""
    payload = bytes(payload)
    if payload[:5] == b"%PDF-":
        from pdf_table_extractor_ray.stages.pdf_crypt import decrypt_pdf

        return decrypt_pdf(payload, password)
    if not is_encrypted(payload):
        raise ValueError("payload is not XENC1-encrypted")
    if password is None:
        raise WrongPassword("no credential configured for encrypted payload")
    want_crc = int.from_bytes(payload[len(MAGIC) : _HEADER_LEN], "big")
    cipher = payload[_HEADER_LEN:]
    plain = _xor(cipher, _keystream(password, len(cipher)))
    if zlib.crc32(plain) != want_crc:
        raise WrongPassword("credential does not decrypt payload")
    return plain
