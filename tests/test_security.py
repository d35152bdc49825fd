"""Crypto tests: RC4 known vectors, AES NIST FIPS-197 vectors, CBC
round-trips, SASLprep cases, and end-to-end encrypted-document
parsing — the analogue of the reference's
``tests/aes_unit_tests.py`` + ``tests/decrypt_unit_tests.py``."""

from binascii import unhexlify

import pytest

from pdf4py_ray.kernel import pdfgen
from pdf4py_ray.kernel.document import PdfDocument
from pdf4py_ray.kernel.errors import PdfWrongPasswordError
from pdf4py_ray.kernel.model import LiteralString, Ref
from pdf4py_ray.kernel.security.aes import (
    cbc_decrypt,
    cbc_encrypt,
    decrypt_block,
    encrypt_block,
    expand_key,
)
from pdf4py_ray.kernel.security.handler import saslprep
from pdf4py_ray.kernel.security.rc4 import rc4


# -- RC4 (public test vectors from the RC4 literature) ---------------------

def test_rc4_known_vectors():
    assert rc4(b"Plaintext", b"Key") == unhexlify("BBF316E8D940AF0AD3")
    assert rc4(b"pedia", b"Wiki") == unhexlify("1021BF0420")
    assert rc4(b"Attack at dawn", b"Secret") == unhexlify("45A01F645FC35B383552544B9BF5")


def test_rc4_symmetric():
    data = bytes(range(256))
    assert rc4(rc4(data, b"k3y"), b"k3y") == data


# -- AES (FIPS-197 appendix vectors) ---------------------------------------

def test_aes128_fips197():
    key = unhexlify("000102030405060708090a0b0c0d0e0f")
    pt = unhexlify("00112233445566778899aabbccddeeff")
    ct = unhexlify("69c4e0d86a7b0430d8cdb78070b4c55a")
    rks = expand_key(key)
    assert encrypt_block(pt, rks) == ct
    assert decrypt_block(ct, rks) == pt


def test_aes192_fips197():
    key = unhexlify("000102030405060708090a0b0c0d0e0f1011121314151617")
    pt = unhexlify("00112233445566778899aabbccddeeff")
    ct = unhexlify("dda97ca4864cdfe06eaf70a0ec0d7191")
    rks = expand_key(key)
    assert encrypt_block(pt, rks) == ct
    assert decrypt_block(ct, rks) == pt


def test_aes256_fips197():
    key = unhexlify("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f")
    pt = unhexlify("00112233445566778899aabbccddeeff")
    ct = unhexlify("8ea2b7ca516745bfeafc49904b496089")
    rks = expand_key(key)
    assert encrypt_block(pt, rks) == ct
    assert decrypt_block(ct, rks) == pt


def test_cbc_roundtrip_padding():
    key = b"0123456789abcdef"
    iv = b"\x07" * 16
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(n % 256))[:n] or b""
        enc = cbc_encrypt(data, key, iv)
        assert len(enc) % 16 == 0
        assert cbc_decrypt(enc, key, iv) == data


def test_cbc_no_padding():
    key = b"0123456789abcdef" * 2
    iv = b"\x00" * 16
    data = b"x" * 32
    assert cbc_decrypt(cbc_encrypt(data, key, iv, padding=False), key, iv, padding=False) == data


# -- SASLprep (reference decrypt_unit_tests.py:61-70 semantics) ------------

def test_saslprep_cases():
    assert saslprep("I­X") == "IX"      # soft hyphen removed
    assert saslprep("user") == "user"
    assert saslprep("USER") == "USER"
    assert saslprep("ª") == "a"          # feminine ordinal → a (NFKC)
    assert saslprep("Ⅸ") == "IX"         # roman numeral → IX
    with pytest.raises(Exception):
        saslprep("")                     # control char forbidden


# -- end-to-end encrypted documents ---------------------------------------

def _walk(doc):
    from pdf4py_ray.kernel.model import Stream

    for _e, obj in doc.iter_objects():
        if isinstance(obj, Stream):
            obj.data()


def test_rc4_encrypted_document_empty_user_password():
    raw = pdfgen.encrypted_pdf(user_pw=b"", owner_pw=b"owner", cfm="V2")
    doc = PdfDocument(raw)
    _walk(doc)
    assert b"(Secret text)" in doc.page_content(doc.pages()[0])
    title = doc.get_object(Ref(61, 0))["Title"]
    assert title == LiteralString(b"Encrypted title")


def test_rc4_encrypted_document_owner_password():
    raw = pdfgen.encrypted_pdf(user_pw=b"user-pw", owner_pw=b"owner", cfm="V2")
    # both the user and the owner password must authenticate
    for pw in (b"user-pw", b"owner"):
        doc = PdfDocument(raw, password=pw)
        assert b"(Secret text)" in doc.page_content(doc.pages()[0])


def test_aesv2_encrypted_document():
    raw = pdfgen.encrypted_pdf(user_pw=b"", owner_pw=b"o", cfm="AESV2")
    doc = PdfDocument(raw)
    _walk(doc)
    assert b"(Secret text)" in doc.page_content(doc.pages()[0])


def test_aesv3_encrypted_string():
    raw = pdfgen.encrypted_pdf_aesv3(password="")
    doc = PdfDocument(raw)
    payload = doc.deref(doc.catalog()["Data"])["Payload"]
    assert payload == LiteralString(b"AES-256 secret")


def test_aesv3_with_password():
    raw = pdfgen.encrypted_pdf_aesv3(password="p@ss")
    doc = PdfDocument(raw, password="p@ss")
    payload = doc.deref(doc.catalog()["Data"])["Payload"]
    assert payload == LiteralString(b"AES-256 secret")


def test_wrong_password_raises():
    raw = pdfgen.encrypted_pdf(user_pw=b"right", owner_pw=b"alsoright", cfm="V2")
    with pytest.raises(PdfWrongPasswordError):
        PdfDocument(raw, password=b"wrong")
    raw5 = pdfgen.encrypted_pdf_aesv3(password="right")
    with pytest.raises(PdfWrongPasswordError):
        PdfDocument(raw5, password="wrong")
