/* Independent C implementation of the fast-hash algorithm (Zilong Tan's
 * published algorithm), used as a native test oracle for the pure-JAX
 * port in lsqfitgp_tpu._jaxutil — the same role as the reference's
 * vendored C fixture (reference tests/fast-hash/).
 *
 * Usage: fasthash_ref <seed> ; reads bytes from stdin, prints the
 * 64-bit digest in hex.
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static uint64_t mix(uint64_t h) {
    h ^= h >> 23;
    h *= 0x2127599bf4325c37ULL;
    h ^= h >> 47;
    return h;
}

static uint64_t fasthash64(const void *buf, size_t len, uint64_t seed) {
    const uint64_t m = 0x880355f21e6d1965ULL;
    const uint64_t *pos = (const uint64_t *)buf;
    const uint64_t *end = pos + (len / 8);
    const unsigned char *pos2;
    uint64_t h = seed ^ (len * m);
    uint64_t v;

    while (pos != end) {
        memcpy(&v, pos, 8);
        pos++;
        h ^= mix(v);
        h *= m;
    }

    pos2 = (const unsigned char *)pos;
    v = 0;
    switch (len & 7) {
    case 7: v ^= (uint64_t)pos2[6] << 48; /* fallthrough */
    case 6: v ^= (uint64_t)pos2[5] << 40; /* fallthrough */
    case 5: v ^= (uint64_t)pos2[4] << 32; /* fallthrough */
    case 4: v ^= (uint64_t)pos2[3] << 24; /* fallthrough */
    case 3: v ^= (uint64_t)pos2[2] << 16; /* fallthrough */
    case 2: v ^= (uint64_t)pos2[1] << 8;  /* fallthrough */
    case 1: v ^= (uint64_t)pos2[0];
        h ^= mix(v);
        h *= m;
    }

    return mix(h);
}

int main(int argc, char **argv) {
    uint64_t seed = 0;
    unsigned char buf[1 << 16];
    size_t n;

    if (argc > 1)
        seed = strtoull(argv[1], NULL, 0);
    n = fread(buf, 1, sizeof buf, stdin);
    printf("%016llx\n", (unsigned long long)fasthash64(buf, n, seed));
    return 0;
}
