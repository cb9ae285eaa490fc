"""Bit-exact reimplementations of the hash functions the reference's
OTTL converters expose, from their public specifications:

- Murmur3Hash / Murmur3Hash128 — MurmurHash3 x86_32 and x64_128
  (Austin Appleby's public-domain algorithm), matching
  pkg/ottl/ottlfuncs/func_murmur3_hash.go / func_murmur3_hash128.go
  (twmb/murmur3, seed 0, little-endian hex output);
- FNV — 64-bit FNV-1a (Go stdlib hash/fnv), matching
  pkg/ottl/ottlfuncs/func_fnv.go (int64 output);
- XXH3 / XXH128 — XXH3-64 and XXH3-128 with the default secret
  (Yann Collet's public xxHash spec), matching
  pkg/ottl/ottlfuncs/func_xxh3.go / func_xxh128.go (zeebo/xxh3,
  seed 0, big-endian hex output).

All verified against the reference's own test vectors
(func_*_test.go) in tests/test_ottl_converters.py.

These run inside Arrow-batched pandas UDFs (SURVEY §2.14 allows the
Python path for exact-hash parity); the per-row Python loop is bounded
by the Arrow batch and only runs for queries that actually call these
converters — never in the flagship parse path.
"""

from __future__ import annotations

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & MASK32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


# ---------------------------------------------------------------------------
# MurmurHash3
# ---------------------------------------------------------------------------

def murmur3_32(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x86_32."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & MASK32
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * c1) & MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & MASK32
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & MASK32
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & MASK32
        k = _rotl32(k, 15)
        k = (k * c2) & MASK32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & MASK32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & MASK32
    h ^= h >> 16
    return h


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """MurmurHash3 x64_128 → (h1, h2)."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & MASK64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[16 * i : 16 * i + 8], "little")
        k2 = int.from_bytes(data[16 * i + 8 : 16 * i + 16], "little")
        k1 = (k1 * c1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64
        k2 = (k2 * c2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    for j in range(min(t, 16) - 1, 7, -1):
        k2 ^= tail[j] << (8 * (j - 8))
    if t > 8:
        k2 = (k2 * c2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * c1) & MASK64
        h2 ^= k2
    for j in range(min(t, 8) - 1, -1, -1):
        k1 ^= tail[j] << (8 * j)
    if t > 0:
        k1 = (k1 * c1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * c2) & MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1, h2


def murmur3_32_hex(s: str) -> str:
    """little-endian hex, as func_murmur3_hash.go returns it."""
    return murmur3_32(s.encode("utf-8")).to_bytes(4, "little").hex()


def murmur3_128_hex(s: str) -> str:
    h1, h2 = murmur3_128(s.encode("utf-8"))
    return (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")).hex()


# ---------------------------------------------------------------------------
# FNV-1a 64
# ---------------------------------------------------------------------------

def fnv1a_64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & MASK64
    return h


def fnv1a_64_signed(s: str) -> int:
    """int64 two's-complement view, as Go's int64(hash.Sum64())."""
    h = fnv1a_64(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def fnv1a_32(data: bytes) -> int:
    h = 0x811C9DC5
    for b in data:
        h ^= b
        h = (h * 0x01000193) & MASK32
    return h


def fnv1a_32_seeded_udf(seed: int):
    """FNV-1a-32 over le32(seed) ‖ utf8(value) — the probabilistic
    sampler's computeHash (probabilisticsamplerprocessor/fnvhasher.go)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    prefix = seed.to_bytes(4, "little")

    # legacy (function, returnType) form: `from __future__ import
    # annotations` makes hint-style signatures unresolvable here
    return F.pandas_udf(
        lambda s: s.map(
            lambda v: None if v is None else fnv1a_32(prefix + v.encode("utf-8"))
        ),
        LongType(),
    )


# ---------------------------------------------------------------------------
# XXH3 (64 and 128) — default secret, seed 0
# ---------------------------------------------------------------------------

_P32_1, _P32_2, _P32_3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D
_P64_1, _P64_2, _P64_3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
_P64_4, _P64_5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "71644897a20df94e3819ef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)


def _r64(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 8], "little")


def _r32(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & MASK32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & MASK64).to_bytes(8, "little"), "big")


def _mul128_fold64(a: int, b: int) -> int:
    p = a * b
    return ((p & MASK64) ^ (p >> 64)) & MASK64


def _xxh64_avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 33
    h = (h * _P64_2) & MASK64
    h ^= h >> 29
    h = (h * _P64_3) & MASK64
    h ^= h >> 32
    return h


def _xxh3_avalanche(h: int) -> int:
    h &= MASK64
    h ^= h >> 37
    h = (h * 0x165667919E3779F9) & MASK64
    h ^= h >> 32
    return h


def _rrmxmx(h: int, length: int) -> int:
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * 0x9FB21C651E98DF25) & MASK64
    h ^= (h >> 35) + length
    h = (h * 0x9FB21C651E98DF25) & MASK64
    h ^= h >> 28
    return h


def _mix16(data: bytes, doff: int, secret: bytes, soff: int, seed: int) -> int:
    lo = _r64(data, doff) ^ ((_r64(secret, soff) + seed) & MASK64)
    hi = _r64(data, doff + 8) ^ ((_r64(secret, soff + 8) - seed) & MASK64)
    return _mul128_fold64(lo, hi)


def _accumulate(data: bytes) -> list[int]:
    """hashLong accumulator loop (shared by 64 and 128-bit variants)."""
    secret = _KSECRET
    acc = [_P32_3, _P64_1, _P64_2, _P64_3, _P64_4, _P32_2, _P64_5, _P32_1]
    stripes_per_block = (len(secret) - 64) // 8  # 16
    block_len = 64 * stripes_per_block
    nb_blocks = (len(data) - 1) // block_len

    def accum_stripe(doff: int, soff: int) -> None:
        for i in range(8):
            dv = _r64(data, doff + 8 * i)
            dk = dv ^ _r64(secret, soff + 8 * i)
            acc[i ^ 1] = (acc[i ^ 1] + dv) & MASK64
            acc[i] = (acc[i] + (dk & MASK32) * (dk >> 32)) & MASK64

    for b in range(nb_blocks):
        for s in range(stripes_per_block):
            accum_stripe(b * block_len + 64 * s, 8 * s)
        for i in range(8):  # scramble
            a = acc[i]
            a ^= a >> 47
            a ^= _r64(secret, len(secret) - 64 + 8 * i)
            acc[i] = (a * _P32_1) & MASK64
    # last (partial) block
    nb_stripes = ((len(data) - 1) - block_len * nb_blocks) // 64
    for s in range(nb_stripes):
        accum_stripe(nb_blocks * block_len + 64 * s, 8 * s)
    accum_stripe(len(data) - 64, len(secret) - 64 - 7)  # last stripe
    return acc


def _merge_accs(acc: list[int], soff: int, start: int) -> int:
    result = start & MASK64
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _r64(_KSECRET, soff + 16 * i),
                acc[2 * i + 1] ^ _r64(_KSECRET, soff + 16 * i + 8),
            )
        ) & MASK64
    return _xxh3_avalanche(result)


def xxh3_64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    secret = _KSECRET
    if n == 0:
        return _xxh64_avalanche(seed ^ _r64(secret, 56) ^ _r64(secret, 64))
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combined = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        bitflip = ((_r32(secret, 0) ^ _r32(secret, 4)) + seed) & MASK64
        return _xxh64_avalanche(combined ^ bitflip)
    if n <= 8:
        seed64 = (seed ^ (_swap32(seed & MASK32) << 32)) & MASK64
        in1, in2 = _r32(data, 0), _r32(data, n - 4)
        bitflip = ((_r64(secret, 8) ^ _r64(secret, 16)) - seed64) & MASK64
        input64 = (in2 + (in1 << 32)) & MASK64
        return _rrmxmx(input64 ^ bitflip, n)
    if n <= 16:
        bf1 = ((_r64(secret, 24) ^ _r64(secret, 32)) + seed) & MASK64
        bf2 = ((_r64(secret, 40) ^ _r64(secret, 48)) - seed) & MASK64
        lo = _r64(data, 0) ^ bf1
        hi = _r64(data, n - 8) ^ bf2
        acc = (n + _swap64(lo) + hi + _mul128_fold64(lo, hi)) & MASK64
        return _xxh3_avalanche(acc)
    if n <= 128:
        acc = (n * _P64_1) & MASK64
        if n > 32:
            if n > 64:
                if n > 96:
                    acc = (acc + _mix16(data, 48, secret, 96, seed)) & MASK64
                    acc = (acc + _mix16(data, n - 64, secret, 112, seed)) & MASK64
                acc = (acc + _mix16(data, 32, secret, 64, seed)) & MASK64
                acc = (acc + _mix16(data, n - 48, secret, 80, seed)) & MASK64
            acc = (acc + _mix16(data, 16, secret, 32, seed)) & MASK64
            acc = (acc + _mix16(data, n - 32, secret, 48, seed)) & MASK64
        acc = (acc + _mix16(data, 0, secret, 0, seed)) & MASK64
        acc = (acc + _mix16(data, n - 16, secret, 16, seed)) & MASK64
        return _xxh3_avalanche(acc)
    if n <= 240:
        acc = (n * _P64_1) & MASK64
        nb = n // 16
        for i in range(8):
            acc = (acc + _mix16(data, 16 * i, secret, 16 * i, seed)) & MASK64
        acc = _xxh3_avalanche(acc)
        for i in range(8, nb):
            acc = (acc + _mix16(data, 16 * i, secret, 16 * (i - 8) + 3, seed)) & MASK64
        acc = (acc + _mix16(data, n - 16, secret, 136 - 17, seed)) & MASK64
        return _xxh3_avalanche(acc)
    acc = _accumulate(data)
    return _merge_accs(acc, 11, (n * _P64_1) & MASK64)


def xxh3_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """→ (high64, low64)."""
    n = len(data)
    secret = _KSECRET
    if n == 0:
        lo = _xxh64_avalanche(seed ^ _r64(secret, 64) ^ _r64(secret, 72))
        hi = _xxh64_avalanche(seed ^ _r64(secret, 80) ^ _r64(secret, 88))
        return hi, lo
    if n <= 3:
        c1, c2, c3 = data[0], data[n >> 1], data[n - 1]
        combl = (c1 << 16) | (c2 << 24) | c3 | (n << 8)
        combh = _rotl32(_swap32(combl), 13)
        bfl = ((_r32(secret, 0) ^ _r32(secret, 4)) + seed) & MASK64
        bfh = ((_r32(secret, 8) ^ _r32(secret, 12)) - seed) & MASK64
        return _xxh64_avalanche(combh ^ bfh), _xxh64_avalanche(combl ^ bfl)
    if n <= 8:
        seed64 = (seed ^ (_swap32(seed & MASK32) << 32)) & MASK64
        in_lo, in_hi = _r32(data, 0), _r32(data, n - 4)
        input64 = (in_lo + (in_hi << 32)) & MASK64
        bitflip = ((_r64(secret, 16) ^ _r64(secret, 24)) + seed64) & MASK64
        keyed = input64 ^ bitflip
        p = keyed * ((_P64_1 + (n << 2)) & MASK64)
        lo, hi = p & MASK64, (p >> 64) & MASK64
        hi = (hi + ((lo << 1) & MASK64)) & MASK64
        lo ^= hi >> 3
        lo ^= lo >> 35
        lo = (lo * 0x9FB21C651E98DF25) & MASK64
        lo ^= lo >> 28
        hi = _xxh3_avalanche(hi)
        return hi, lo
    if n <= 16:
        bfl = ((_r64(secret, 32) ^ _r64(secret, 40)) - seed) & MASK64
        bfh = ((_r64(secret, 48) ^ _r64(secret, 56)) + seed) & MASK64
        in_lo = _r64(data, 0)
        in_hi = _r64(data, n - 8)
        p = (in_lo ^ in_hi ^ bfl) * _P64_1
        m_lo, m_hi = p & MASK64, (p >> 64) & MASK64
        m_lo = (m_lo + ((n - 1) << 54)) & MASK64
        in_hi ^= bfh
        m_hi = (m_hi + in_hi + (in_hi & MASK32) * (_P32_2 - 1)) & MASK64
        m_lo ^= _swap64(m_hi)
        q = m_lo * _P64_2
        h_lo, h_hi = q & MASK64, (q >> 64) & MASK64
        h_hi = (h_hi + m_hi * _P64_2) & MASK64
        return _xxh3_avalanche(h_hi), _xxh3_avalanche(h_lo)

    def mix32(al: int, ah: int, off1: int, off2: int, soff: int, sd: int):
        al = (al + _mix16(data, off1, secret, soff, sd)) & MASK64
        al ^= (_r64(data, off2) + _r64(data, off2 + 8)) & MASK64
        ah = (ah + _mix16(data, off2, secret, soff + 16, sd)) & MASK64
        ah ^= (_r64(data, off1) + _r64(data, off1 + 8)) & MASK64
        return al, ah

    if n <= 128:
        al, ah = (n * _P64_1) & MASK64, 0
        i = (n - 1) // 32
        while i >= 0:
            al, ah = mix32(al, ah, 16 * i, n - 16 * (i + 1), 32 * i, seed)
            i -= 1
        lo = (al + ah) & MASK64
        hi = (al * _P64_1 + ah * _P64_4 + ((n - seed) & MASK64) * _P64_2) & MASK64
        return (0 - _xxh3_avalanche(hi)) & MASK64, _xxh3_avalanche(lo)
    if n <= 240:
        al, ah = (n * _P64_1) & MASK64, 0
        nb = n // 32
        for i in range(4):
            al, ah = mix32(al, ah, 32 * i, 32 * i + 16, 32 * i, seed)
        al, ah = _xxh3_avalanche(al), _xxh3_avalanche(ah)
        for i in range(4, nb):
            al, ah = mix32(al, ah, 32 * i, 32 * i + 16, 3 + 32 * (i - 4), seed)
        al, ah = mix32(al, ah, n - 16, n - 32, 136 - 17 - 16, (0 - seed) & MASK64)
        lo = (al + ah) & MASK64
        hi = (al * _P64_1 + ah * _P64_4 + ((n - seed) & MASK64) * _P64_2) & MASK64
        return (0 - _xxh3_avalanche(hi)) & MASK64, _xxh3_avalanche(lo)
    acc = _accumulate(data)
    lo = _merge_accs(acc, 11, (n * _P64_1) & MASK64)
    hi = _merge_accs(
        acc, len(_KSECRET) - 64 - 11, (~(n * _P64_2)) & MASK64
    )
    return hi, lo


def xxh3_64_hex(s: str) -> str:
    """big-endian hex, as zeebo/xxh3's Sum(nil) serializes it."""
    return xxh3_64(s.encode("utf-8")).to_bytes(8, "big").hex()


def xxh3_128_hex(s: str) -> str:
    hi, lo = xxh3_128(s.encode("utf-8"))
    return hi.to_bytes(8, "big").hex() + lo.to_bytes(8, "big").hex()
