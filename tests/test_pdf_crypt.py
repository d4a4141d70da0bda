"""PDF standard security handler (stages/pdf_crypt.py)."""

import numpy as np
import pytest

from pdf_table_extractor_ray.stages.pdf_crypt import (
    WrongPassword,
    aes128_encrypt_block,
    authenticate_user,
    compute_key,
    compute_o,
    compute_u,
    decrypt_pdf,
    encrypt_pdf,
    pdf_is_encrypted,
    rc4,
)
from pdf_table_extractor_ray.stages.pdf_native import build_pdf, parse_pdf_words

PAGES = [
    [(72.0, 700.0, "Data"), (140.0, 700.0, "02/01/2024"), (260.0, 700.0, "1.234,56")],
    [(72.0, 700.0, "Saldo"), (140.0, 700.0, "-99,10")],
]


def test_aes_fips197_known_answer():
    """FIPS-197 Appendix C.1 — pins the generated S-box, key schedule
    and round structure in one shot."""
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert aes128_encrypt_block(key, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_rc4_known_vectors():
    # classic published test vectors
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    # involution
    assert rc4(b"k", rc4(b"k", b"round trip")) == b"round trip"


def test_key_derivation_self_consistent():
    """Algorithm 2/3/5 fixed-point: the /O and /U entries built from a
    password authenticate that password and no other."""
    id0 = bytes(range(16))
    for rev in (2, 3):
        bits = 40 if rev == 2 else 128
        o = compute_o("user-pw", "owner-pw", bits, rev)
        key = compute_key("user-pw", o, -44, id0, bits, rev)
        u = compute_u(key, id0, rev)
        got = authenticate_user("user-pw", o, u, -44, id0, bits, rev)
        assert got == key
        assert authenticate_user("other", o, u, -44, id0, bits, rev) is None


@pytest.mark.parametrize("method", ["rc4", "aesv2"])
def test_encrypt_decrypt_parse_roundtrip(method):
    plain = build_pdf(PAGES)
    ref = parse_pdf_words(plain)
    enc = encrypt_pdf(plain, "s3cret", owner_pw="owner", method=method)
    assert pdf_is_encrypted(enc)
    assert not pdf_is_encrypted(plain)
    # ciphertext must actually differ from plaintext streams
    assert b"BT" not in enc or enc.count(b"BT") < plain.count(b"BT")
    dec = decrypt_pdf(enc, "s3cret")
    assert not pdf_is_encrypted(dec)
    assert parse_pdf_words(dec) == ref


@pytest.mark.parametrize("method", ["rc4", "aesv2"])
def test_wrong_and_missing_password(method):
    enc = encrypt_pdf(build_pdf(PAGES), "s3cret", method=method)
    with pytest.raises(WrongPassword):
        decrypt_pdf(enc, "nope")
    with pytest.raises(WrongPassword):
        decrypt_pdf(enc, None)


def test_v5_without_aesv3_filter_rejected():
    """/V 5 is supported only through the standard /AESV3 crypt
    filter; a V5 dict without it must fail loudly, not mis-decrypt."""
    enc = bytearray(encrypt_pdf(build_pdf(PAGES), "pw", method="rc4"))
    i = enc.find(b"/V 2")
    enc[i : i + 4] = b"/V 5"
    with pytest.raises(ValueError, match="/V 5"):
        decrypt_pdf(bytes(enc), "pw")


def test_aes_tamper_detected():
    """Flipping ciphertext bytes must not silently produce garbage
    output: either padding fails or the downstream zlib stream breaks."""
    import re
    import zlib

    enc = bytearray(encrypt_pdf(build_pdf(PAGES), "pw", method="aesv2"))
    m = re.search(rb"stream\r?\n", enc)
    pos = m.end() + 24  # inside the first stream's ciphertext
    enc[pos] ^= 0xFF
    with pytest.raises((ValueError, zlib.error)):
        dec = decrypt_pdf(bytes(enc), "pw")
        parse_pdf_words(dec)


def test_strategy_seam_end_to_end(ray_session):
    """A real encrypted PDF flows through detection → credential seam →
    spec decrypt → native parser; wrong-credential documents surface as
    in-band error rows, never failures (the conversor_c6 pikepdf
    shape)."""
    from pdf_table_extractor_ray.fixtures import generate_doc
    from pdf_table_extractor_ray.stages.config import StrategyConfig
    from pdf_table_extractor_ray.stages.registry import (
        detect_format,
        extract_document,
        make_strategies,
    )

    # a real fixture PDF (statement-shaped word boxes → records)
    plain = None
    for i in range(400):
        d = generate_doc(i)
        if d["family"] == "pdf_native" and bytes(d["html"][:8]) == b"%PDF-1.4":
            plain = bytes(d["html"])
            break
    assert plain is not None
    enc = encrypt_pdf(plain, "pdfx-demo", method="aesv2")  # default credential
    assert detect_format(enc, None) == "encrypted"
    assert detect_format(plain, None) == "pdf_native"

    key, res = extract_document({"url": "u", "html": enc, "text": None})
    ref_key, ref = extract_document({"url": "u", "html": plain, "text": None})
    assert key == "encrypted" and ref_key == "pdf_native"
    assert res.status == ref.status != "error"
    assert res.extracted_text == ref.extracted_text  # byte-identical text
    assert ref.extracted_text  # the parse really saw the words

    # wrong credential: in-band error row, not an exception
    bad_cfg = StrategyConfig(credentials={"default": "wrong"})
    strategies = make_strategies(bad_cfg)
    key2, out = extract_document(
        {"url": "u", "html": enc, "text": None}, strategies=strategies
    )
    assert key2 == "encrypted" and out.status == "error"
    assert "WrongPassword" in out.error


# --- PDF 2.0 / AES-256 (/V 5 /R 6 /AESV3) ----------------------------------


def test_aes256_fips197_known_answer():
    """FIPS-197 Appendix C.3 — pins the 8-word key schedule and the
    14-round structure."""
    from pdf_table_extractor_ray.stages.pdf_crypt import (
        _decrypt_block,
        _encrypt_block,
        _expand_key,
    )

    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct, _expand_key(key)) == pt


def test_hash_2b_properties():
    """Algorithm 2.B: 32-byte output, deterministic, salt- and
    password-sensitive (no public KAT exists in the spec; the
    roundtrip below is the functional pin)."""
    from pdf_table_extractor_ray.stages.pdf_crypt import hash_2b

    a = hash_2b(b"pw", b"saltsalt")
    assert len(a) == 32
    assert a == hash_2b(b"pw", b"saltsalt")
    assert a != hash_2b(b"pw", b"other-sa")
    assert a != hash_2b(b"pw2", b"saltsalt")
    assert hash_2b(b"pw", b"saltsalt", b"udata") != a


def test_aes256_roundtrip_user_owner_and_wrong_password():
    plain = build_pdf(PAGES)
    ref = parse_pdf_words(plain)
    enc = encrypt_pdf(plain, "s3cret", owner_pw="boss", method="aes256")
    assert pdf_is_encrypted(enc)
    assert b"/AESV3" in enc and b"/R 6" in enc
    assert parse_pdf_words(decrypt_pdf(enc, "s3cret")) == ref  # user pw
    assert parse_pdf_words(decrypt_pdf(enc, "boss")) == ref  # owner pw
    with pytest.raises(WrongPassword):
        decrypt_pdf(enc, "neither")
    with pytest.raises(WrongPassword):
        decrypt_pdf(enc, None)


def test_aes256_strategy_seam(ray_session):
    """An AES-256 document routes through the same credential seam as
    the legacy handlers."""
    from pdf_table_extractor_ray.stages.registry import detect_format, extract_document

    enc = encrypt_pdf(build_pdf(PAGES), "pdfx-demo", method="aes256")
    assert detect_format(enc, None) == "encrypted"
    key, res = extract_document({"url": "u", "html": enc, "text": None})
    assert key == "encrypted" and res.status != "error"


@pytest.mark.parametrize("method", ["rc4", "aesv2", "aes256"])
def test_encrypted_pdf15_objstm_roundtrip(method):
    """Encryption over the PDF 1.5 layout: the ObjStm stays packed and
    ENCRYPTED, the never-encrypted XRef stream is dropped (offsets go
    stale under re-serialization; the byte scanner is authoritative),
    and the decrypted document parses word-identically."""
    plain15 = build_pdf(PAGES, pdf15=True)
    assert b"/ObjStm" in plain15
    ref = parse_pdf_words(plain15)
    enc = encrypt_pdf(plain15, "s3cret", method=method)
    assert pdf_is_encrypted(enc)
    assert b"/XRef" not in enc  # xref stream dropped, not encrypted
    assert b"/ObjStm" in enc  # the container object survives (head is plaintext)
    dec = decrypt_pdf(enc, "s3cret")
    assert parse_pdf_words(dec) == ref
    with pytest.raises(WrongPassword):
        decrypt_pdf(enc, "wrong")
