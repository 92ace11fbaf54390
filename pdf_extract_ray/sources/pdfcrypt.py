"""From-scratch PDF standard-security-handler crypto (stdlib only).

The reference opens encrypted PDFs transparently through PyMuPDF
(`euaa_사례/pdf_to_json/layout_analyzer.py:21` — fitz handles the common
"encrypted with an empty user password" case, which is how most
"protected" PDFs on the web are produced).  This module gives
``sources/pdf.py`` the same coverage without any dependency:

* RC4 (the spec's own pseudocode, 20 lines),
* AES-128/256 ECB/CBC implemented from FIPS-197 (tables GENERATED from
  the GF(2^8) definition at import, verified against the FIPS-197
  appendix vectors in tests),
* the standard security handler's key-derivation algorithms 2/2.A/2.B
  and password checks 4/5 for revisions R2-R6 (RC4-40, RC4-128,
  AESV2/128, AESV3/256),
* a deterministic ENCRYPTOR used to build test fixtures (salts are
  caller-provided, so fixture bytes are reproducible).

Only streams are decrypted by the reader: every byte the extractor uses
(content streams, ObjStm containers, font programs, ToUnicode CMaps)
lives in a stream; dict strings (/Title, ...) are not on the extraction
path and stay undecrypted.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES (FIPS-197).  Tables derived from the field definition, not typed in.
# ---------------------------------------------------------------------------

_EXP = [0] * 510
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _EXP[_i + 255] = _x
    _LOG[_x] = _i
    # multiply by 0x03 (a generator): x*3 = x ^ xtime(x)
    _x ^= (_x << 1) ^ (0x11B if _x & 0x80 else 0)
    _x &= 0xFF


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _rotl8(b: int, n: int) -> int:
    return ((b << n) | (b >> (8 - n))) & 0xFF


_SBOX = [0] * 256
_INV_SBOX = [0] * 256
for _a in range(256):
    _inv = _EXP[255 - _LOG[_a]] if _a else 0
    _s = (_inv ^ _rotl8(_inv, 1) ^ _rotl8(_inv, 2) ^ _rotl8(_inv, 3)
          ^ _rotl8(_inv, 4) ^ 0x63)
    _SBOX[_a] = _s
    _INV_SBOX[_s] = _a

_RCON = [0] * 11
_c = 1
for _i in range(1, 11):
    _RCON[_i] = _c
    _c = _gmul(_c, 2)


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i: 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    # round keys as 16-byte lists
    return [[b for word in w[4 * r: 4 * r + 4] for b in word]
            for r in range(nr + 1)]


def _encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [block[i] ^ rk[0][i] for i in range(16)]
    for rnd in range(1, nr):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state laid out as s[r + 4c] == in[r+4c]:
        # flat index i = 4c + r here (we keep FIPS byte order in[0..15] with
        # state[r][c] = in[r + 4c]); shift row r left by r
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = s[r + 4 * ((c + r) % 4)]
        s = t
        # MixColumns
        m = [0] * 16
        for c in range(4):
            col = s[4 * c: 4 * c + 4]
            m[4 * c + 0] = _gmul(col[0], 2) ^ _gmul(col[1], 3) ^ col[2] ^ col[3]
            m[4 * c + 1] = col[0] ^ _gmul(col[1], 2) ^ _gmul(col[2], 3) ^ col[3]
            m[4 * c + 2] = col[0] ^ col[1] ^ _gmul(col[2], 2) ^ _gmul(col[3], 3)
            m[4 * c + 3] = _gmul(col[0], 3) ^ col[1] ^ col[2] ^ _gmul(col[3], 2)
        s = [m[i] ^ rk[rnd][i] for i in range(16)]
    s = [_SBOX[b] for b in s]
    t = [0] * 16
    for c in range(4):
        for r in range(4):
            t[r + 4 * c] = s[r + 4 * ((c + r) % 4)]
    return bytes(t[i] ^ rk[nr][i] for i in range(16))


def _decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = [block[i] ^ rk[nr][i] for i in range(16)]
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows (shift row r right by r)
        t = [0] * 16
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = s[r + 4 * ((c - r) % 4)]
        s = [_INV_SBOX[b] for b in t]
        s = [s[i] ^ rk[rnd][i] for i in range(16)]
        m = [0] * 16
        for c in range(4):
            col = s[4 * c: 4 * c + 4]
            m[4 * c + 0] = (_gmul(col[0], 14) ^ _gmul(col[1], 11)
                            ^ _gmul(col[2], 13) ^ _gmul(col[3], 9))
            m[4 * c + 1] = (_gmul(col[0], 9) ^ _gmul(col[1], 14)
                            ^ _gmul(col[2], 11) ^ _gmul(col[3], 13))
            m[4 * c + 2] = (_gmul(col[0], 13) ^ _gmul(col[1], 9)
                            ^ _gmul(col[2], 14) ^ _gmul(col[3], 11))
            m[4 * c + 3] = (_gmul(col[0], 11) ^ _gmul(col[1], 13)
                            ^ _gmul(col[2], 9) ^ _gmul(col[3], 14))
        s = m
    t = [0] * 16
    for c in range(4):
        for r in range(4):
            t[r + 4 * c] = s[r + 4 * ((c - r) % 4)]
    s = [_INV_SBOX[b] for b in t]
    return bytes(s[i] ^ rk[0][i] for i in range(16))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding (callers pad; R6's hash loop uses exact multiples)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt requires 16-byte-aligned input")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i: i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC, NO padding removal (PDF strips PKCS#7 at the call site)."""
    if len(data) % 16:
        data = data[: len(data) - len(data) % 16]  # tolerate truncated tails
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i: i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    return bytes(out)


def _unpad(data: bytes) -> bytes:
    if not data:
        return data
    n = data[-1]
    if 1 <= n <= 16 and n <= len(data):
        return data[:-n]
    return data


# ---------------------------------------------------------------------------
# standard security handler
# ---------------------------------------------------------------------------

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def _pad_pw(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


def _md5(*parts: bytes) -> bytes:
    h = hashlib.md5()
    for p in parts:
        h.update(p)
    return h.digest()


def _file_key_rc4(pw: bytes, o: bytes, p: int, id0: bytes, r: int,
                  length_bits: int, encrypt_metadata: bool) -> bytes:
    """Algorithm 2: the MD5-based file key for R2-R4."""
    n = 5 if r == 2 else max(5, min(16, length_bits // 8))
    buf = _pad_pw(pw) + o[:32] + struct.pack("<i", p) + id0
    if r >= 4 and not encrypt_metadata:
        buf += b"\xff\xff\xff\xff"
    key = _md5(buf)
    if r >= 3:
        for _ in range(50):
            key = _md5(key[:n])
    return key[:n]


def _user_check_rc4(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R>=3): the expected /U value for this key."""
    if r == 2:
        return rc4(key, PAD)
    u = rc4(key, _md5(PAD + id0))
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16  # 32-byte entry; only first 16 compared


def _hash_r6(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """Algorithm 2.B: the iterated SHA-2/AES hash of revision 6."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class PdfDecryptor:
    """Derived-key holder; ``stream_bytes(num, gen, raw)`` decrypts one
    stream.  Build with :func:`make_decryptor`; ``None`` means the file's
    password doesn't match (or the scheme is unsupported) and the caller
    should degrade to no-spans."""

    def __init__(self, file_key: bytes, v: int, aes: bool):
        self.file_key = file_key
        self.v = v
        self.aes = aes

    def _obj_key(self, num: int, gen: int) -> bytes:
        if self.v >= 5:
            return self.file_key
        ext = b"sAlT" if self.aes else b""
        k = _md5(self.file_key + struct.pack("<I", num)[:3]
                 + struct.pack("<I", gen)[:2] + ext)
        return k[: min(len(self.file_key) + 5, 16)]

    def stream_bytes(self, num: int, gen: int, raw: bytes) -> bytes:
        key = self._obj_key(num, gen)
        if self.aes or self.v >= 5:
            if len(raw) < 16:
                return b""
            return _unpad(aes_cbc_decrypt(key, raw[:16], raw[16:]))
        return rc4(key, raw)


def make_decryptor(enc: dict, id0: bytes,
                   password: bytes = b"") -> PdfDecryptor | None:
    """Build a decryptor from a resolved /Encrypt dict + first /ID string.

    Supports the standard handler (/Filter /Standard), V 1/2/4/5,
    R 2/3/4/5/6, stream crypt methods V2 (RC4), AESV2, AESV3.  Returns
    None when the (default empty) password fails validation or the
    scheme is out of scope.
    """
    try:
        v = int(enc.get("V", 0))
        r = int(enc.get("R", 2))
        o = enc.get("O") or b""
        u = enc.get("U") or b""
        p = int(enc.get("P", -1))
        length_bits = int(enc.get("Length", 40))
        em = enc.get("EncryptMetadata")
        encrypt_metadata = True if em is None else bool(em)
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            return None

        aes = False
        if v in (4, 5):
            cf = enc.get("CF") or {}
            stdcf = cf.get("StdCF") if isinstance(cf, dict) else None
            cfm = None
            if isinstance(stdcf, dict):
                cfm = stdcf.get("CFM")
                cfm = cfm[1] if isinstance(cfm, tuple) else cfm
            if cfm in ("AESV2", "AESV3"):
                aes = True
            elif cfm not in ("V2", None):
                return None

        if v in (1, 2, 4) and r in (2, 3, 4):
            key = _file_key_rc4(password, o, p, id0, r, length_bits,
                                encrypt_metadata)
            expect = _user_check_rc4(key, id0, r)
            got = u[:32]
            ok = (got[:16] == expect[:16]) if r >= 3 else (got == expect[:32])
            if not ok:
                return None
            return PdfDecryptor(key, v, aes)

        if v == 5 and r in (5, 6):
            if len(u) < 48:
                return None
            vsalt, ksalt = u[32:40], u[40:48]
            if r == 6:
                if _hash_r6(password, vsalt) != u[:32]:
                    return None
                inter = _hash_r6(password, ksalt)
            else:  # R5: plain SHA-256
                if hashlib.sha256(password + vsalt).digest() != u[:32]:
                    return None
                inter = hashlib.sha256(password + ksalt).digest()
            ue = enc.get("UE") or b""
            if not isinstance(ue, bytes) or len(ue) < 32:
                return None
            file_key = aes_cbc_decrypt(inter, b"\x00" * 16, ue[:32])
            return PdfDecryptor(file_key, v, True)
    except Exception:
        return None
    return None


# ---------------------------------------------------------------------------
# encryptor (test fixtures; deterministic — salts/ids supplied by caller)
# ---------------------------------------------------------------------------


def make_encrypt_dict_rc4(id0: bytes, *, r: int = 3, length_bits: int = 128,
                          v: int | None = None, p: int = -4,
                          user_pw: bytes = b"", owner_pw: bytes | None = None,
                          aes: bool = False) -> tuple[dict, PdfDecryptor]:
    """The /Encrypt dict values (O, U, ...) for an RC4/AESV2 file plus the
    matching encryptor (encryption == decryption for RC4; for AES the
    caller uses ``encrypt_stream``)."""
    owner_pw = user_pw if owner_pw is None else owner_pw
    if v is None:
        v = 1 if length_bits == 40 and not aes else (4 if aes else 2)
    # Algorithm 3: /O
    okey = _md5(_pad_pw(owner_pw))
    if r >= 3:
        for _ in range(50):
            okey = _md5(okey)
    n = 5 if r == 2 else length_bits // 8
    okey = okey[:n]
    o = rc4(okey, _pad_pw(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey), o)
    key = _file_key_rc4(user_pw, o, p, id0, r, length_bits, True)
    u = _user_check_rc4(key, id0, r)
    enc = {"Filter": ("name", "Standard"), "V": v, "R": r, "O": o,
           "U": u[:32], "P": p, "Length": length_bits}
    if v == 4:
        enc["CF"] = {"StdCF": {"CFM": ("name", "AESV2" if aes else "V2"),
                               "Length": length_bits // 8}}
        enc["StmF"] = ("name", "StdCF")
        enc["StrF"] = ("name", "StdCF")
    return enc, PdfDecryptor(key, v, aes)


def make_encrypt_dict_aes256(*, r: int = 6, user_pw: bytes = b"",
                             file_key: bytes = b"\x11" * 32,
                             vsalt: bytes = b"A" * 8,
                             ksalt: bytes = b"B" * 8) -> tuple[dict, PdfDecryptor]:
    """AES-256 (V5, R5/R6) /Encrypt values for a chosen file key."""
    if r == 6:
        uhash = _hash_r6(user_pw, vsalt)
        inter = _hash_r6(user_pw, ksalt)
    else:
        uhash = hashlib.sha256(user_pw + vsalt).digest()
        inter = hashlib.sha256(user_pw + ksalt).digest()
    ue = aes_cbc_encrypt(inter, b"\x00" * 16, file_key)
    # /O validation is owner-side; reader checks user path, so mirror it
    enc = {"Filter": ("name", "Standard"), "V": 5, "R": r,
           "O": b"\x00" * 48, "U": uhash + vsalt + ksalt, "UE": ue,
           "OE": b"\x00" * 32, "P": -4, "Length": 256,
           "CF": {"StdCF": {"CFM": ("name", "AESV3"), "Length": 32}},
           "StmF": ("name", "StdCF"), "StrF": ("name", "StdCF")}
    return enc, PdfDecryptor(file_key, 5, True)


def encrypt_stream(dec: PdfDecryptor, num: int, gen: int, data: bytes,
                   iv: bytes = b"\x00" * 16) -> bytes:
    """Inverse of ``PdfDecryptor.stream_bytes`` (fixture builder)."""
    key = dec._obj_key(num, gen)
    if dec.aes or dec.v >= 5:
        padn = 16 - len(data) % 16
        return iv + aes_cbc_encrypt(key, iv, data + bytes([padn]) * padn)
    return rc4(key, data)
