"""Deterministic host-side PRNG for enum dictionaries.

Parity: reference ``src/utils.ts:40-69`` (Mulberry32 + generateRandomStrings,
seed=1).  Bit-exact re-implementation of the JS semantics (Math.imul 32-bit
multiply, unsigned shifts, ToInt32 coercions) so the enum value dictionaries
of the wide ``events`` schema are byte-identical to the reference's.

Verified against node:
    generate_random_strings(5, 1)  == ["m","A","g","8","8"]
    generate_random_strings(6, 8)[0] == "mAg88Rls"
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF

_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"


def mulberry32(seed: int = 1):
    """JS Mulberry32; all arithmetic mod 2**32 (matches ToInt32/ToUint32)."""
    state = seed

    def rng() -> float:
        nonlocal state
        state = (state + 0x6D2B79F5) & _MASK32
        t = state
        t = ((t ^ (t >> 15)) * (t | 1)) & _MASK32
        t = (t ^ (t + ((t ^ (t >> 7)) * (t | 61)) & _MASK32)) & _MASK32
        return (t ^ (t >> 14)) / 4294967296

    return rng


def random_string(rng, length: int) -> str:
    return "".join(_CHARS[int(rng() * len(_CHARS))] for _ in range(length))


def generate_random_strings(count: int, length: int, seed: int = 1) -> list[str]:
    rng = mulberry32(seed)
    return [random_string(rng, length) for _ in range(count)]
