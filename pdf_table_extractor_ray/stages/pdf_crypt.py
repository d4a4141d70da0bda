"""PDF standard security handler (ISO 32000-1 §7.6 + ISO 32000-2
§7.6.4) in pure Python — the REAL encryption the round-4 XOR stand-in
deferred: RC4 (/V 2 /R 3, 40–128-bit), AES-128-CBC (/V 4 /R 4 /AESV2)
and AES-256-CBC (/V 5 /R 6 /AESV3, the PDF 2.0 handler with the
Algorithm 2.B hardened SHA-256/384/512 + AES-CBC hash, /UE / /OE key
wraps and the /Perms check) with spec-exact key derivation
(Algorithms 2–6 / 2.A / 2.B / 8 / 9), plus the matching writers so
the golden fixture corpora can mint genuinely password-protected PDFs
(the reference opens such files via pikepdf — conversor_c6.py:36,109;
no crypto library exists in this container, so both directions are
implemented from the public spec).

AES-128 is implemented from FIPS-197 with the S-box GENERATED from the
GF(2⁸) affine construction (no typed-in table to mistype) and is pinned
against the FIPS-197 Appendix C known-answer vector in tests. RC4 is
the classic KSA/PRGA byte loop. Throughput is irrelevant here: payloads
decrypt once per document inside the extraction actors, and fixture
documents are KB-scale; a production deployment at 100 TB would swap
`_aes_cbc_*` for a hardware-backed library behind the same function
seam.

Writer limitation (documented, loud): strings OUTSIDE streams are not
encrypted/decrypted — the fixture writer (`pdf_native.build_pdf`)
serializes every string inside content streams, so the limitation is
unreachable in this corpus; a dict-string PDF would fail parsing
downstream rather than silently mis-decrypt.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Dict, Optional, Tuple

import numpy as np

from pdf_table_extractor_ray.stages.encrypted import WrongPassword

# §7.6.3.3 padding string
_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# ---------------------------------------------------------------------------
# RC4


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES-128 (FIPS-197), S-box generated from the affine construction


def _rotl8(x: int, k: int) -> int:
    return ((x << k) | (x >> (8 - k))) & 0xFF


def _make_sbox() -> Tuple[list, list]:
    sbox = [0] * 256
    p = q = 1
    while True:
        # p iterates over GF(2^8)* via multiplication by 3 (a generator)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # q tracks p's multiplicative inverse via division by 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        sbox[p] = q ^ _rotl8(q, 1) ^ _rotl8(q, 2) ^ _rotl8(q, 3) ^ _rotl8(q, 4) ^ 0x63
        if p == 1:
            break
    sbox[0] = 0x63
    inv = [0] * 256
    for i, v in enumerate(sbox):
        inv[v] = i
    return sbox, inv


_SBOX, _INV_SBOX = _make_sbox()


def _gmul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return r


def _expand_key(key: bytes) -> list:
    """AES key schedule → Nr+1 round keys of 16 bytes (AES-128: 11,
    AES-256: 15; FIPS-197 §5.2 incl. the Nk>6 extra SubWord rule)."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    rcon = 1
    words = [list(key[i : i + 4]) for i in range(0, 4 * nk, 4)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _gmul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        bytes(b for w in words[4 * r : 4 * r + 4] for b in w)
        for r in range(nr + 1)
    ]


# scalar-path multiply tables (the per-call _gmul loop dominated the
# R6 hardened hash before these: MixColumns is 8 multiplies per column)
_G2T = [_gmul(i, 2) for i in range(256)]
_G3T = [_gmul(i, 3) for i in range(256)]
_G9T = [_gmul(i, 9) for i in range(256)]
_G11T = [_gmul(i, 11) for i in range(256)]
_G13T = [_gmul(i, 13) for i in range(256)]
_G14T = [_gmul(i, 14) for i in range(256)]


def _add_round_key(state: list, rk: bytes) -> None:
    for i in range(16):
        state[i] ^= rk[i]


_SHIFT = [0, 5, 10, 15, 4, 9, 14, 3, 8, 13, 2, 7, 12, 1, 6, 11]
_INV_SHIFT = [0, 13, 10, 7, 4, 1, 14, 11, 8, 5, 2, 15, 12, 9, 6, 3]


def _encrypt_block(block: bytes, rks: list) -> bytes:
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[0])
    for rnd in range(1, nr + 1):
        st = [_SBOX[b] for b in st]  # SubBytes
        st = [st[_SHIFT[i]] for i in range(16)]  # ShiftRows
        if rnd < nr:  # MixColumns
            out = [0] * 16
            for c in range(4):
                a0, a1, a2, a3 = st[4 * c : 4 * c + 4]
                out[4 * c + 0] = _G2T[a0] ^ _G3T[a1] ^ a2 ^ a3
                out[4 * c + 1] = a0 ^ _G2T[a1] ^ _G3T[a2] ^ a3
                out[4 * c + 2] = a0 ^ a1 ^ _G2T[a2] ^ _G3T[a3]
                out[4 * c + 3] = _G3T[a0] ^ a1 ^ a2 ^ _G2T[a3]
            st = out
        _add_round_key(st, rks[rnd])
    return bytes(st)


def _decrypt_block(block: bytes, rks: list) -> bytes:
    nr = len(rks) - 1
    st = list(block)
    _add_round_key(st, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        st = [st[_INV_SHIFT[i]] for i in range(16)]  # InvShiftRows
        st = [_INV_SBOX[b] for b in st]  # InvSubBytes
        _add_round_key(st, rks[rnd])
        if rnd > 0:  # InvMixColumns
            out = [0] * 16
            for c in range(4):
                a0, a1, a2, a3 = st[4 * c : 4 * c + 4]
                out[4 * c + 0] = _G14T[a0] ^ _G11T[a1] ^ _G13T[a2] ^ _G9T[a3]
                out[4 * c + 1] = _G9T[a0] ^ _G14T[a1] ^ _G11T[a2] ^ _G13T[a3]
                out[4 * c + 2] = _G13T[a0] ^ _G9T[a1] ^ _G14T[a2] ^ _G11T[a3]
                out[4 * c + 3] = _G11T[a0] ^ _G13T[a1] ^ _G9T[a2] ^ _G14T[a3]
            st = out
    return bytes(st)


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    """Single-block ECB encrypt (FIPS-197 known-answer seam)."""
    return _encrypt_block(block, _expand_key(key))


# vectorized decrypt path: CBC DECRYPT has no serial dependency (every
# block deciphers independently, then XORs with the PREVIOUS ciphertext
# block), so all blocks run as one numpy pass — the difference between
# ~40 KB/s (per-byte Python) and MB/s inside the extraction actors.
# CBC ENCRYPT is inherently serial (each block chains on the previous
# ciphertext) and stays scalar — it only runs at fixture-minting time.
_INV_SBOX_NP = np.array(_INV_SBOX, np.uint8)
_INV_SHIFT_NP = np.array(_INV_SHIFT, np.int64)
_G9 = np.array([_gmul(i, 9) for i in range(256)], np.uint8)
_G11 = np.array([_gmul(i, 11) for i in range(256)], np.uint8)
_G13 = np.array([_gmul(i, 13) for i in range(256)], np.uint8)
_G14 = np.array([_gmul(i, 14) for i in range(256)], np.uint8)


def _decrypt_blocks_np(cipher: bytes, rks: list) -> np.ndarray:
    """ECB-decrypt every 16-byte block of ``cipher`` at once → (n, 16)."""
    nr = len(rks) - 1
    st = np.frombuffer(cipher, np.uint8).reshape(-1, 16).copy()
    rk = [np.frombuffer(k, np.uint8) for k in rks]
    st ^= rk[nr]
    for rnd in range(nr - 1, -1, -1):
        st = st[:, _INV_SHIFT_NP]
        st = _INV_SBOX_NP[st]
        st ^= rk[rnd]
        if rnd > 0:
            a = st.reshape(-1, 4, 4)
            a0, a1, a2, a3 = a[:, :, 0], a[:, :, 1], a[:, :, 2], a[:, :, 3]
            m = np.empty_like(a)
            m[:, :, 0] = _G14[a0] ^ _G11[a1] ^ _G13[a2] ^ _G9[a3]
            m[:, :, 1] = _G9[a0] ^ _G14[a1] ^ _G11[a2] ^ _G13[a3]
            m[:, :, 2] = _G13[a0] ^ _G9[a1] ^ _G14[a2] ^ _G11[a3]
            m[:, :, 3] = _G11[a0] ^ _G13[a1] ^ _G9[a2] ^ _G14[a3]
            st = m.reshape(-1, 16)
    return st


def _aes_cbc_encrypt(key: bytes, iv: bytes, plain: bytes) -> bytes:
    rks = _expand_key(key)
    pad = 16 - len(plain) % 16
    plain = plain + bytes([pad]) * pad  # PKCS#7 (always ≥ 1 byte)
    out = bytearray()
    prev = iv
    for i in range(0, len(plain), 16):
        blk = bytes(a ^ b for a, b in zip(plain[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, iv: bytes, cipher: bytes) -> bytes:
    if len(cipher) % 16 or not cipher:
        raise ValueError("AES-CBC ciphertext not block-aligned")
    dec = _decrypt_blocks_np(cipher, _expand_key(key))
    prev = np.vstack(
        [
            np.frombuffer(iv, np.uint8)[None, :],
            np.frombuffer(cipher, np.uint8).reshape(-1, 16)[:-1],
        ]
    )
    out = (dec ^ prev).tobytes()
    pad = out[-1]
    if not (1 <= pad <= 16) or out[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad AES padding")
    return out[:-pad]


def _aes_cbc_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """AES-CBC without padding (the R6 key-wrap / hardened-hash shape;
    data must be block-aligned)."""
    if len(data) % 16:
        raise ValueError("CBC-NoPad data not block-aligned")
    rks = _expand_key(key)
    if not encrypt:
        dec = _decrypt_blocks_np(data, rks)
        prev = np.vstack(
            [
                np.frombuffer(iv, np.uint8)[None, :],
                np.frombuffer(data, np.uint8).reshape(-1, 16)[:-1],
            ]
        )
        return (dec ^ prev).tobytes()
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out += prev
    return bytes(out)


# ---------------------------------------------------------------------------
# PDF 2.0 / AES-256 handler (ISO 32000-2 §7.6.4, /V 5 /R 6)


def hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B — the hardened SHA-2 hash of revision 6: an
    iterated SHA-256/384/512 + AES-CBC mangling loop (≥ 64 rounds,
    data-dependent stop)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_nopad(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def _r6_entries(user_pw: str, owner_pw: Optional[str], file_key: bytes, p: int, seed: bytes):
    """(/U, /UE, /O, /OE, /Perms) for revision 6. Salts derive
    deterministically from ``seed`` so fixture minting is pure."""
    pw = user_pw.encode("utf-8")[:127]
    opw = (owner_pw if owner_pw is not None else user_pw).encode("utf-8")[:127]
    vs = hashlib.sha256(b"vs" + seed).digest()[:8]
    ks = hashlib.sha256(b"ks" + seed).digest()[:8]
    ovs = hashlib.sha256(b"ovs" + seed).digest()[:8]
    oks = hashlib.sha256(b"oks" + seed).digest()[:8]
    u = hash_2b(pw, vs) + vs + ks
    ue = _aes_cbc_nopad(hash_2b(pw, ks), b"\x00" * 16, file_key, encrypt=True)
    o = hash_2b(opw, ovs, u) + ovs + oks
    oe = _aes_cbc_nopad(hash_2b(opw, oks, u), b"\x00" * 16, file_key, encrypt=True)
    perms_plain = (
        struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T" + b"adb"
        + hashlib.sha256(b"rnd" + seed).digest()[:4]
    )
    perms = _encrypt_block(perms_plain, _expand_key(file_key))
    return u, ue, o, oe, perms


def _r6_authenticate(password: Optional[str], u: bytes, ue: bytes, o: bytes, oe: bytes) -> bytes:
    """File key via the user OR owner password (Algorithms 2.A/8/9);
    raises WrongPassword when neither matches."""
    pw = (password or "").encode("utf-8")[:127]
    if hash_2b(pw, u[32:40]) == u[:32]:
        return _aes_cbc_nopad(hash_2b(pw, u[40:48]), b"\x00" * 16, ue, encrypt=False)
    if o is not None and oe is not None and hash_2b(pw, o[32:40], u[:48]) == o[:32]:
        return _aes_cbc_nopad(
            hash_2b(pw, o[40:48], u[:48]), b"\x00" * 16, oe, encrypt=False
        )
    raise WrongPassword("credential does not open this PDF (R6)")


# ---------------------------------------------------------------------------
# standard security handler key derivation (§7.6.3.3-4, Algorithms 2-6)


def _pad_password(pw: str | bytes) -> bytes:
    b = pw.encode("latin-1") if isinstance(pw, str) else bytes(pw)
    return (b + _PAD)[:32]


def compute_key(
    password: str | bytes,
    o_entry: bytes,
    p: int,
    id0: bytes,
    length_bits: int,
    rev: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key from the USER password."""
    n = length_bits // 8
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(id0)
    if rev >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    d = h.digest()
    if rev >= 3:
        for _ in range(50):
            d = hashlib.md5(d[:n]).digest()
    return d[:n]


def compute_o(user_pw: str, owner_pw: Optional[str], length_bits: int, rev: int) -> bytes:
    """Algorithm 3: the /O entry."""
    n = length_bits // 8
    d = hashlib.md5(_pad_password(owner_pw if owner_pw is not None else user_pw)).digest()
    if rev >= 3:
        for _ in range(50):
            d = hashlib.md5(d).digest()
    rc4_key = d[:n]
    o = rc4(rc4_key, _pad_password(user_pw))
    if rev >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in rc4_key), o)
    return o


def compute_u(key: bytes, id0: bytes, rev: int) -> bytes:
    """Algorithm 4 (rev 2) / Algorithm 5 (rev ≥ 3): the /U entry."""
    if rev == 2:
        return rc4(key, _PAD)
    d = hashlib.md5(_PAD + id0).digest()
    u = rc4(key, d)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


def authenticate_user(
    password: str | bytes,
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    id0: bytes,
    length_bits: int,
    rev: int,
    encrypt_metadata: bool = True,
) -> Optional[bytes]:
    """Algorithm 6: file key when ``password`` is the user password,
    else None."""
    key = compute_key(password, o_entry, p, id0, length_bits, rev, encrypt_metadata)
    u = compute_u(key, id0, rev)
    ok = u[:32] == u_entry[:32] if rev == 2 else u[:16] == u_entry[:16]
    return key if ok else None


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """§7.6.2 Algorithm 1 per-object key."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(num.to_bytes(3, "little"))
    h.update(gen.to_bytes(2, "little"))
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_object_data(data: bytes, obj_key: bytes, aes: bool) -> bytes:
    if aes:
        if len(data) < 16:
            raise ValueError("AES stream shorter than its IV")
        return _aes_cbc_decrypt(obj_key, data[:16], data[16:])
    return rc4(obj_key, data)


def encrypt_object_data(data: bytes, obj_key: bytes, aes: bool, iv: bytes = b"") -> bytes:
    if aes:
        iv = (iv + b"\x00" * 16)[:16] if iv else hashlib.md5(data).digest()
        return iv + _aes_cbc_encrypt(obj_key, iv, data)
    return rc4(obj_key, data)


# ---------------------------------------------------------------------------
# whole-document writer / reader (classic-xref PDFs, the fixture shape)

_ENCRYPT_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_HEXSTR = r"<([0-9A-Fa-f\s]*)>"
_LITSTR = r"\(((?:\\.|[^\\()])*)\)"


def pdf_is_encrypted(data) -> bool:
    if not isinstance(data, (bytes, bytearray, memoryview)):
        return False
    data = bytes(data)
    return data[:5] == b"%PDF-" and _ENCRYPT_REF_RE.search(data) is not None


def _dict_bytes_entry(head: bytes, key: bytes) -> Optional[bytes]:
    """A string entry (/O, /U) as raw bytes — hex or literal form."""
    m = re.search(key + rb"\s*" + _HEXSTR.encode(), head)
    if m:
        hx = re.sub(rb"\s", b"", m.group(1))
        return bytes.fromhex(hx.decode("ascii"))
    m = re.search(key + rb"\s*" + _LITSTR.encode(), head, re.DOTALL)
    if m:
        raw = m.group(1)
        out = bytearray()
        i = 0
        while i < len(raw):
            c = raw[i]
            if c == 0x5C and i + 1 < len(raw):  # backslash escape
                nxt = raw[i + 1]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                    j = i + 1
                    oct_digits = b""
                    while j < len(raw) and j < i + 4 and 0x30 <= raw[j] <= 0x37:
                        oct_digits += bytes([raw[j]])
                        j += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                    i = j
                else:
                    out.append(nxt)
                    i += 2
            else:
                out.append(c)
                i += 1
        return bytes(out)
    return None


def _serialize_classic(objs: Dict[int, bytes], trailer_extra: bytes) -> bytes:
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    max_obj = max(objs)
    out += f"xref\n0 {max_obj + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size " + str(max_obj + 1).encode() + b" /Root 1 0 R"
        + trailer_extra
        + b" >>\nstartxref\n"
        + str(xref_at).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def encrypt_pdf(
    data: bytes,
    user_pw: str,
    owner_pw: Optional[str] = None,
    method: str = "rc4",
) -> bytes:
    """Classic-xref PDF → the same document encrypted under the
    standard security handler. ``method``: ``"rc4"`` (/V 2 /R 3,
    128-bit), ``"aesv2"`` (/V 4 /R 4 /AESV2, AES-128-CBC) or
    ``"aes256"`` (/V 5 /R 6 /AESV3, AES-256-CBC — the PDF 2.0
    handler with the Algorithm 2.B hardened hash)."""
    from pdf_table_extractor_ray.stages.pdf_native import _scan_objects

    if method not in ("rc4", "aesv2", "aes256"):
        raise ValueError(f"unknown encryption method {method!r}")
    id0 = hashlib.md5(data).digest()
    p = -44  # print allowed, modify denied — a typical bank-statement P
    if method == "aes256":
        aes = True
        file_key = hashlib.sha256(b"filekey" + id0).digest()
        u, ue, o_r6, oe, perms = _r6_entries(user_pw, owner_pw, file_key, p, id0)
        key = file_key
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 "
            b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
            b"/StmF /StdCF /StrF /StdCF "
            b"/U <" + u.hex().encode() + b"> /UE <" + ue.hex().encode() + b"> "
            b"/O <" + o_r6.hex().encode() + b"> /OE <" + oe.hex().encode() + b"> "
            b"/Perms <" + perms.hex().encode() + b"> /P " + str(p).encode() + b" >>"
        )
    else:
        aes = method == "aesv2"
        rev = 4 if aes else 3
        length_bits = 128
        o = compute_o(user_pw, owner_pw, length_bits, rev)
        key = compute_key(user_pw, o, p, id0, length_bits, rev)
        u = compute_u(key, id0, rev)
        if aes:
            enc_dict = (
                b"<< /Filter /Standard /V 4 /R 4 /Length 128 "
                b"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> "
                b"/StmF /StdCF /StrF /StdCF "
            )
        else:
            enc_dict = b"<< /Filter /Standard /V 2 /R 3 /Length 128 "
        enc_dict += (
            b"/O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b"> /P "
            + str(p).encode()
            + b" >>"
        )

    objs_in = _scan_objects(data)
    objs: Dict[int, bytes] = {}
    for num, (head, stream) in objs_in.items():
        if b"/XRef" in head:
            # cross-reference streams are NEVER encrypted (spec) and
            # their offsets go stale under re-serialization anyway —
            # drop them; the classic trailer + the byte scanner carry
            # the document (ObjStm objects stay packed and encrypted,
            # the legal classic-xref + object-stream hybrid)
            continue
        if stream is None:
            objs[num] = head
            continue
        objkey = key if method == "aes256" else object_key(key, num, 0, aes)
        enc = encrypt_object_data(
            stream, objkey, aes, iv=hashlib.md5(id0 + num.to_bytes(3, "little")).digest()
        )
        head2 = re.sub(rb"/Length\s+\d+\b", b"/Length " + str(len(enc)).encode(), head, count=1)
        objs[num] = head2 + b"\nstream\n" + enc + b"\nendstream"
    enc_num = max(objs) + 1
    objs[enc_num] = enc_dict
    trailer_extra = (
        b" /Encrypt " + str(enc_num).encode() + b" 0 R /ID [<" + id0.hex().encode()
        + b"> <" + id0.hex().encode() + b">]"
    )
    return _serialize_classic(objs, trailer_extra)


def decrypt_pdf(data: bytes, password: Optional[str]) -> bytes:
    """Encrypted classic-xref PDF → decrypted serialization (no
    /Encrypt), ready for the normal pdf_native pipeline. Raises
    ``WrongPassword`` on a bad/missing credential, ``ValueError`` on
    unsupported encryption shapes (non-standard crypt filters,
    /V > 5) — both surface as in-band error rows in the extraction
    stage."""
    from pdf_table_extractor_ray.stages.pdf_native import _scan_objects

    m = _ENCRYPT_REF_RE.search(data)
    if not m:
        raise ValueError("PDF is not encrypted")
    if password is None:
        raise WrongPassword("no credential configured for encrypted PDF")
    enc_num = int(m.group(1))
    objs = _scan_objects(data)
    if enc_num not in objs:
        raise ValueError("missing /Encrypt dictionary object")
    enc_head, _ = objs[enc_num]
    vm = re.search(rb"/V\s+(\d+)", enc_head)
    rm = re.search(rb"/R\s+(\d+)", enc_head)
    lm = re.search(rb"/Length\s+(\d+)", enc_head)
    pm = re.search(rb"/P\s+(-?\d+)", enc_head)
    v = int(vm.group(1)) if vm else 0
    rev = int(rm.group(1)) if rm else 2
    length_bits = int(lm.group(1)) if lm else 40
    if v not in (1, 2, 4, 5):
        raise ValueError(f"unsupported encryption /V {v}")
    if v == 5:
        if b"/AESV3" not in enc_head:
            raise ValueError("unsupported /V 5 crypt filter (need /AESV3)")
        u = _dict_bytes_entry(enc_head, rb"/U")
        ue = _dict_bytes_entry(enc_head, rb"/UE")
        o = _dict_bytes_entry(enc_head, rb"/O")
        oe = _dict_bytes_entry(enc_head, rb"/OE")
        if u is None or ue is None or len(u) < 48:
            raise ValueError("malformed R6 /Encrypt dictionary")
        key = _r6_authenticate(password, u, ue, o, oe)
        # sanity: /Perms decrypts to ...'adb' under the recovered key
        perms = _dict_bytes_entry(enc_head, rb"/Perms")
        if perms is not None and len(perms) == 16:
            pp = _decrypt_block(perms, _expand_key(key))
            if pp[9:12] != b"adb":
                raise WrongPassword("R6 /Perms check failed")
        aes = True
        v5 = True
    else:
        aes = False
        if v == 4:
            if b"/AESV2" in enc_head:
                aes = True
            elif b"/V2" not in enc_head:
                raise ValueError("unsupported /V 4 crypt filter (need /AESV2 or /V2)")
        o = _dict_bytes_entry(enc_head, rb"/O")
        u = _dict_bytes_entry(enc_head, rb"/U")
        if o is None or u is None or pm is None:
            raise ValueError("malformed /Encrypt dictionary")
        p = int(pm.group(1))
        idm = _ID_RE.search(data)
        id0 = bytes.fromhex(idm.group(1).decode("ascii")) if idm else b""
        encrypt_metadata = b"/EncryptMetadata false" not in enc_head
        key = authenticate_user(password, o, u, p, id0, length_bits, rev, encrypt_metadata)
        if key is None:
            raise WrongPassword("credential does not open this PDF")
        v5 = False

    out_objs: Dict[int, bytes] = {}
    for num, (head, stream) in objs.items():
        if num == enc_num:
            continue
        if b"/XRef" in head:
            continue  # never encrypted; offsets stale — scanner carries it
        if stream is None:
            out_objs[num] = head
            continue
        objkey = key if v5 else object_key(key, num, 0, aes)
        plain = decrypt_object_data(stream, objkey, aes)
        head2 = re.sub(
            rb"/Length\s+\d+\b", b"/Length " + str(len(plain)).encode(), head, count=1
        )
        out_objs[num] = head2 + b"\nstream\n" + plain + b"\nendstream"
    return _serialize_classic(out_objs, b"")
