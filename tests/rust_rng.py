"""Pure-Python replica of Rust rand 0.8's StdRng (ChaCha12) + Uniform<f32>.

Needed to regenerate the exact seeded graphs of the reference's insta
snapshot tests (/root/reference/tests/snapshot.rs): StdRng::seed_from_u64
(rand_core's PCG32-based seed filler), ChaCha12 keystream u32 draws, and
ndarray-rand's Uniform::new(0f32, 10f32) sampling.
"""

from __future__ import annotations

import struct

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


def seed_from_u64(state: int) -> bytes:
    """rand_core 0.6 SeedableRng::seed_from_u64: PCG32 output per 4 bytes."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    out = bytearray()
    for _ in range(8):  # 32-byte seed
        state = (state * MUL + INC) & M64
        xorshifted = (((state >> 18) ^ state) >> 27) & M32
        rot = state >> 59
        x = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & M32
        out += struct.pack("<I", x)
    return bytes(out)


def _rotl32(x: int, n: int) -> int:
    return ((x << n) | (x >> (32 - n))) & M32


def _quarter(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & M32
    s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & M32
    s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & M32
    s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & M32
    s[b] = _rotl32(s[b] ^ s[c], 7)


class ChaCha12:
    """ChaCha with 12 rounds, 64-bit counter at words 12-13, stream at 14-15
    (rand_chacha layout); words streamed block-sequentially."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self.key = list(struct.unpack("<8I", seed))
        self.counter = 0
        self.buf: list = []

    def _block(self) -> list:
        c = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
        state = c + self.key + [
            self.counter & M32,
            (self.counter >> 32) & M32,
            0,
            0,
        ]
        w = list(state)
        for _ in range(6):  # 12 rounds = 6 double rounds
            _quarter(w, 0, 4, 8, 12)
            _quarter(w, 1, 5, 9, 13)
            _quarter(w, 2, 6, 10, 14)
            _quarter(w, 3, 7, 11, 15)
            _quarter(w, 0, 5, 10, 15)
            _quarter(w, 1, 6, 11, 12)
            _quarter(w, 2, 7, 8, 13)
            _quarter(w, 3, 4, 9, 14)
        out = [(w[i] + state[i]) & M32 for i in range(16)]
        self.counter += 1
        return out

    def next_u32(self) -> int:
        if not self.buf:
            self.buf = self._block()
        return self.buf.pop(0)


class StdRng(ChaCha12):
    def __init__(self, seed_u64: int):
        super().__init__(seed_from_u64(seed_u64))

    def uniform_f32(self, low: float, high: float) -> float:
        """rand 0.8 UniformFloat<f32>::sample: 23-bit value0_1 · scale + low
        (the scale adjustment loop never triggers for [0, 10))."""
        import numpy as np

        bits = self.next_u32() >> 9
        value1_2 = struct.unpack("<f", struct.pack("<I", (127 << 23) | bits))[0]
        f32 = np.float32
        return float(f32(f32(value1_2) - f32(1.0)) * (f32(high) - f32(low))
                     + f32(low))
