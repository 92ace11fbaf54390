"""Encrypted-PDF coverage: the standard security handler with an empty
user password (reference parity: fitz opens such files transparently,
`euaa_사례/pdf_to_json/layout_analyzer.py:21`).  Crypto primitives are
verified against published vectors (FIPS-197 appendix C, RC4 known
answers) so the from-scratch AES/RC4 in sources/pdfcrypt.py is anchored
to an external spec, not to itself."""

import pytest

from pdf_extract_ray.sources import pdfcrypt as pc
from pdf_extract_ray.sources.pdf import (
    build_simple_pdf,
    document_to_pdf,
    encrypt_pdf,
    pdf_pages_spans,
)

SCHEMES = ["rc4-40", "rc4-128", "aesv2", "aes256", "aes256r5"]


# ---------------------------------------------------------------------------
# primitive vectors
# ---------------------------------------------------------------------------

def test_aes128_fips197_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pc._expand_key(key)
    ct = pc._encrypt_block(rk, pt)
    assert ct == bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert pc._decrypt_block(rk, ct) == pt


def test_aes192_fips197_c2():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pc._expand_key(key)
    ct = pc._encrypt_block(rk, pt)
    assert ct == bytes.fromhex("dda97ca4864cdfe06eaf70a0ec0d7191")
    assert pc._decrypt_block(rk, ct) == pt


def test_aes256_fips197_c3():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f"
        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    rk = pc._expand_key(key)
    ct = pc._encrypt_block(rk, pt)
    assert ct == bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
    assert pc._decrypt_block(rk, ct) == pt


def test_rc4_known_answers():
    assert pc.rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
    assert pc.rc4(b"Wiki", b"pedia") == bytes.fromhex("1021bf0420")
    assert pc.rc4(b"Secret", b"Attack at dawn") == bytes.fromhex(
        "45a01f645fc35b383552544b9bf5")


def test_aes_cbc_round_trip():
    key = b"\x00" * 16
    iv = b"\x01" * 16
    data = bytes(range(48))
    assert pc.aes_cbc_decrypt(key, iv, pc.aes_cbc_encrypt(key, iv, data)) \
        == data


# ---------------------------------------------------------------------------
# handler authentication
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(r=2, length_bits=40),
    dict(r=3, length_bits=128),
    dict(r=4, length_bits=128, aes=True),
])
def test_rc4_family_auth(kw):
    enc, built = pc.make_encrypt_dict_rc4(b"\xab" * 16, **kw)
    dec = pc.make_decryptor(enc, b"\xab" * 16)
    assert dec is not None and dec.file_key == built.file_key
    assert pc.make_decryptor(enc, b"\xab" * 16, b"wrong") is None


@pytest.mark.parametrize("r", [5, 6])
def test_aes256_auth(r):
    enc, built = pc.make_encrypt_dict_aes256(r=r)
    dec = pc.make_decryptor(enc, b"")
    assert dec is not None and dec.file_key == built.file_key
    assert pc.make_decryptor(enc, b"", b"wrong") is None


def test_nonempty_user_password_auth():
    enc, built = pc.make_encrypt_dict_rc4(
        b"\xcd" * 16, r=3, length_bits=128, user_pw=b"s3cret")
    assert pc.make_decryptor(enc, b"\xcd" * 16) is None
    dec = pc.make_decryptor(enc, b"\xcd" * 16, b"s3cret")
    assert dec is not None and dec.file_key == built.file_key


def test_stream_round_trip_rc4_and_aes():
    enc, d = pc.make_encrypt_dict_rc4(b"\xab" * 16, r=3, length_bits=128)
    raw = pc.encrypt_stream(d, 7, 0, b"hello stream data")
    assert d.stream_bytes(7, 0, raw) == b"hello stream data"
    enc, d = pc.make_encrypt_dict_aes256()
    raw = pc.encrypt_stream(d, 7, 0, b"hello stream data", iv=b"\x01" * 16)
    assert d.stream_bytes(7, 0, raw) == b"hello stream data"


# ---------------------------------------------------------------------------
# end-to-end: encrypted fixture == plain extraction
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def plain_pdf():
    return document_to_pdf("Crypto Title", "alpha beta gamma " * 120,
                           compress=True)


@pytest.fixture(scope="module")
def plain_spans(plain_pdf):
    spans = pdf_pages_spans(plain_pdf)
    assert spans and any(p["lines"] for p in spans)
    return spans


@pytest.mark.parametrize("scheme", SCHEMES)
def test_encrypted_extraction_matches_plain(scheme, plain_pdf, plain_spans):
    encd = encrypt_pdf(plain_pdf, scheme=scheme)
    assert encd != plain_pdf
    assert pdf_pages_spans(encd) == plain_spans


@pytest.mark.parametrize("scheme", SCHEMES)
def test_password_protected_degrades_to_empty_pages(scheme, plain_pdf):
    locked = encrypt_pdf(plain_pdf, scheme=scheme, user_pw=b"secret")
    pages = pdf_pages_spans(locked)
    # page-tree metadata is unencrypted and still visible; no text leaks
    assert all(not p["lines"] for p in pages)


def test_encrypted_uncompressed_streams(plain_spans):
    plain = document_to_pdf("Crypto Title", "alpha beta gamma " * 120,
                            compress=False)
    encd = encrypt_pdf(plain, scheme="aesv2")
    assert pdf_pages_spans(encd) == plain_spans


def test_encrypted_fixture_is_deterministic(plain_pdf):
    a = encrypt_pdf(plain_pdf, scheme="aes256")
    b = encrypt_pdf(plain_pdf, scheme="aes256")
    assert a == b


def test_corrupted_encrypted_never_raises(plain_pdf):
    encd = encrypt_pdf(plain_pdf, scheme="rc4-128")
    for cut in (10, len(encd) // 2, len(encd) - 40):
        pdf_pages_spans(encd[:cut])  # must not raise
    flipped = bytearray(encd)
    for pos in range(60, len(flipped), 997):
        flipped[pos] ^= 0xFF
    pdf_pages_spans(bytes(flipped))  # must not raise


def test_ciphertext_contains_no_plaintext(plain_pdf):
    # the content stream text must not appear in the encrypted file
    plain = build_simple_pdf(["BT /F1 11 Tf 72 700 Td (NEEDLE7Q) Tj ET"])
    assert b"NEEDLE7Q" in plain
    for scheme in SCHEMES:
        encd = encrypt_pdf(plain, scheme=scheme)
        assert b"NEEDLE7Q" not in encd
        got = pdf_pages_spans(encd)
        assert any("NEEDLE7Q" in ln["text"]
                   for p in got for ln in p["lines"])


def test_ser_value_floats_never_exponent():
    """ADVICE r3: PDF number syntax has no exponent form — _ser_value
    must emit fixed-point for every float (fixture builder path)."""
    from pdf_extract_ray.sources.pdf import _ser_value

    assert _ser_value(1e-05) == "0.00001"
    assert _ser_value(-1e-05) == "-0.00001"
    assert _ser_value(0.0) == "0"
    assert _ser_value(1.5) == "1.5"
    assert _ser_value(2.0) == "2"
    big = _ser_value(1e20)
    assert "e" not in big.lower() and float(big) == 1e20
