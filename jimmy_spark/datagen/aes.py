"""Pure-Python AES-128-CBC *encryptor* (FIPS-197), used only at datagen
time to mint foreign-ciphertext fixtures.

The registry's decrypt queries must prove they can decrypt ciphertext they
did not produce (the reference decrypts real ColorNote/Evernote exports:
/root/reference/src/jimmy/formats/colornote.py:37-54,
md_lib/evernote.py:19-49). The container has no crypto library, so this
module implements the ENCRYPT side from the public FIPS-197 spec — tables
derived programmatically (GF(2^8) inverse + affine map), key schedule and
rounds straight from the standard — while the engine decrypts JVM-side
with Spark's built-in ``aes_decrypt``. Two independent implementations
meeting on NIST test vectors (doctests below) and on every fixture row is
the anti-circularity argument.

Performance does not matter here (2k captions at datagen time); clarity
and independence do.
"""

from __future__ import annotations

# --- GF(2^8) tables, derived (not transcribed) --------------------------


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B  # x^8 + x^4 + x^3 + x + 1
        b >>= 1
    return p


def _build_sbox() -> list[int]:
    # multiplicative inverse via exhaustive search (256^2 is nothing),
    # then the affine transform b ^ rot1..4(b) ^ 0x63
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = []
    for x in range(256):
        b = inv[x]
        s = b
        for r in (1, 2, 3, 4):
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox.append(s ^ 0x63)
    return sbox

_SBOX = _build_sbox()
_RCON = [1]
for _ in range(9):
    _RCON.append(_gf_mul(_RCON[-1], 2))


def _expand_key(key: bytes) -> list[list[int]]:
    """11 round keys of 16 bytes, AES-128 schedule."""
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _encrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    # state is column-major (FIPS-197 s[r][c] = in[r + 4c]); the flat
    # layout below keeps column c at bytes [4c, 4c+4), i.e. input order
    s = list(block)

    def add_rk(st, rk):
        return [a ^ b for a, b in zip(st, rk)]

    def sub_shift(st):
        # SubBytes + ShiftRows on the flat byte-major layout: byte i sits
        # at row i%4, col i//4; row r rotates left by r columns
        out = [0] * 16
        for c in range(4):
            for r in range(4):
                out[c * 4 + r] = _SBOX[st[((c + r) % 4) * 4 + r]]
        return out

    def mix(st):
        out = [0] * 16
        for c in range(4):
            a = st[c * 4 : c * 4 + 4]
            t = a[0] ^ a[1] ^ a[2] ^ a[3]
            for r in range(4):
                out[c * 4 + r] = a[r] ^ t ^ _gf_mul(a[r] ^ a[(r + 1) % 4], 2)
        return out

    s = add_rk(s, rks[0])
    for rnd in range(1, 10):
        s = add_rk(mix(sub_shift(s)), rks[rnd])
    s = add_rk(sub_shift(s), rks[10])
    return bytes(s)


def aes128_cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """PKCS7-padded AES-128-CBC.

    FIPS-197 appendix C.1 single-block vector (via a no-op IV and a
    pre-padded check against the first 16 ciphertext bytes):

    >>> key = bytes(range(16))
    >>> pt = bytes.fromhex('00112233445566778899aabbccddeeff')
    >>> aes128_cbc_encrypt(key, bytes(16), pt)[:16].hex()
    '69c4e0d86a7b0430d8cdb78070b4c55a'

    NIST SP 800-38A F.2.1 CBC-AES128 first block:

    >>> key = bytes.fromhex('2b7e151628aed2a6abf7158809cf4f3c')
    >>> iv = bytes.fromhex('000102030405060708090a0b0c0d0e0f')
    >>> pt = bytes.fromhex('6bc1bee22e409f96e93d7e117393172a')
    >>> aes128_cbc_encrypt(key, iv, pt)[:16].hex()
    '7649abac8119b246cee98e9b12e9197d'
    """
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AES-128-CBC needs 16-byte key and iv")
    pad = 16 - len(plaintext) % 16
    data = plaintext + bytes([pad]) * pad
    rks = _expand_key(key)
    out = []
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rks)
        out.append(prev)
    return b"".join(out)


# --- inverse cipher (FIPS-197 §5.3) — used by the ENML <en-crypt>
# recursive re-parse (functions/markup.py), which decrypts INSIDE a
# per-row Python handler where Spark's JVM aes_decrypt can't reach.

_ISBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _ISBOX[_v] = _i


def _decrypt_block(block: bytes, rks: list[list[int]]) -> bytes:
    def add_rk(st, rk):
        return [a ^ b for a, b in zip(st, rk)]

    def inv_sub_shift(st):
        # inverse of sub_shift: row r rotates RIGHT by r, then InvSubBytes
        out = [0] * 16
        for c in range(4):
            for r in range(4):
                out[((c + r) % 4) * 4 + r] = _ISBOX[st[c * 4 + r]]
        return out

    def inv_mix(st):
        out = [0] * 16
        for c in range(4):
            a = st[c * 4 : c * 4 + 4]
            for r in range(4):
                out[c * 4 + r] = (
                    _gf_mul(a[r], 14)
                    ^ _gf_mul(a[(r + 1) % 4], 11)
                    ^ _gf_mul(a[(r + 2) % 4], 13)
                    ^ _gf_mul(a[(r + 3) % 4], 9)
                )
        return out

    s = add_rk(list(block), rks[10])
    for rnd in range(9, 0, -1):
        s = inv_mix(add_rk(inv_sub_shift(s), rks[rnd]))
    s = add_rk(inv_sub_shift(s), rks[0])
    return bytes(s)


def aes128_cbc_decrypt(key: bytes, iv: bytes, ciphertext: bytes) -> bytes:
    """PKCS7-unpadded AES-128-CBC decrypt; inverse of the encryptor above.

    >>> key, iv = bytes(range(16)), bytes(range(16, 32))
    >>> aes128_cbc_decrypt(key, iv, aes128_cbc_encrypt(key, iv, b'round trip!'))
    b'round trip!'

    NIST SP 800-38A F.2.2 CBC-AES128.Decrypt first block:

    >>> key = bytes.fromhex('2b7e151628aed2a6abf7158809cf4f3c')
    >>> iv = bytes.fromhex('000102030405060708090a0b0c0d0e0f')
    >>> ct = bytes.fromhex('7649abac8119b246cee98e9b12e9197d')
    >>> bytes(a ^ b for a, b in zip(_decrypt_block(ct, _expand_key(key)), iv)).hex()
    '6bc1bee22e409f96e93d7e117393172a'
    """
    if len(key) != 16 or len(iv) != 16:
        raise ValueError("AES-128-CBC needs 16-byte key and iv")
    if len(ciphertext) % 16 or not ciphertext:
        raise ValueError("ciphertext must be a positive multiple of 16 bytes")
    rks = _expand_key(key)
    out = []
    prev = iv
    for i in range(0, len(ciphertext), 16):
        blk = ciphertext[i : i + 16]
        out.append(bytes(a ^ b for a, b in zip(_decrypt_block(blk, rks), prev)))
        prev = blk
    data = b"".join(out)
    pad = data[-1]
    if not 1 <= pad <= 16 or data[-pad:] != bytes([pad]) * pad:
        raise ValueError("bad PKCS7 padding")
    return data[:-pad]
