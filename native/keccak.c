/* keccak-f[1600] permutation + one-block absorb, C fast path for the
 * EVM-compatible Keccak256 transcript (halo2_tpu/transcript/keccak.py).
 * Original Keccak padding (0x01) is handled in Python; this exposes the
 * permutation only, via ctypes.  Build: native/build.sh -> libhalo2keccak.so
 */
#include <stdint.h>
#include <string.h>

#define ROL64(v, n) (((v) << (n)) | ((v) >> (64 - (n))))

static const uint64_t RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

/* rotation offsets indexed [x][y], matching the Python table */
static const unsigned R[5][5] = {
    {0, 36, 3, 41, 18},
    {1, 44, 10, 45, 2},
    {62, 6, 43, 15, 61},
    {28, 55, 25, 21, 56},
    {27, 20, 39, 8, 14},
};

/* state layout: s[x + 5*y] (lane (x, y)) */
void keccak_f1600(uint64_t *s) {
    uint64_t c[5], d[5], b[25];
    for (int round = 0; round < 24; round++) {
        for (int x = 0; x < 5; x++)
            c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
        for (int x = 0; x < 5; x++) {
            uint64_t t = c[(x + 1) % 5];
            d[x] = c[(x + 4) % 5] ^ ROL64(t, 1);
        }
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) s[x + 5 * y] ^= d[x];
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++) {
                unsigned r = R[x][y];
                uint64_t v = s[x + 5 * y];
                b[y + 5 * ((2 * x + 3 * y) % 5)] = r ? ROL64(v, r) : v;
            }
        for (int x = 0; x < 5; x++)
            for (int y = 0; y < 5; y++)
                s[x + 5 * y] = b[x + 5 * y] ^ ((~b[((x + 1) % 5) + 5 * y]) &
                                               b[((x + 2) % 5) + 5 * y]);
        s[0] ^= RC[round];
    }
}

/* absorb one rate-sized block (136 bytes) then permute */
void keccak_absorb_block(uint64_t *s, const uint8_t *block) {
    for (int i = 0; i < 17; i++) {
        uint64_t lane;
        memcpy(&lane, block + 8 * i, 8); /* little-endian hosts only */
        s[i] ^= lane;
    }
    keccak_f1600(s);
}
