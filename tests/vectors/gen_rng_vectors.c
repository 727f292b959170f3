/* Independent RNG vector generator for the parity test suite.
 *
 * The sequential SGD oracle (gfasort_tpu/ops/exact.py +
 * gfasort_tpu/native/sgd_exact.cpp) must reproduce the reference's RNG
 * stream bit-for-bit (gfasort /root/reference/src/sgd.rs:429-432 uses
 * rand_xoshiro::Xoshiro256Plus seeded via rand_core's SplitMix64
 * seed_from_u64, rand 0.9's Lemire uniform-int sampler, and the 53-bit
 * f64 convention).  No Rust toolchain exists in this environment, so
 * this file provides the next-best independent anchor: a C
 * transcription of the PUBLISHED algorithms, written from the public
 * specifications, compiled and run once to produce
 * tests/vectors/rng_vectors.json which tests/test_rng_vectors.py pins
 * against gfasort_tpu/ops/rng.py.
 *
 * Sources of the algorithms (public domain / documented):
 *  - xoshiro256+ : Blackman & Vigna, xoshiro256plus.c (CC0),
 *    https://prng.di.unimi.it/xoshiro256plus.c — next() transcribed
 *    verbatim below.
 *  - SplitMix64 : Vigna, splitmix64.c (CC0),
 *    https://prng.di.unimi.it/splitmix64.c — transcribed verbatim.
 *  - rand_core SeedableRng::seed_from_u64 : documented to fill the
 *    seed words from a SplitMix64 stream initialized with the u64
 *    seed (rand_core 0.9 docs) — s[0..3] = four successive outputs.
 *  - rand 0.9 UniformInt sample: Lemire's widening-multiply method
 *    with threshold rejection ("Fast Random Integer Generation in an
 *    Interval", Lemire 2019; rand::distr::uniform::UniformInt):
 *    range = high - low (half-open new()), thresh = (-range) % range,
 *    accept x when lo64(x * range) >= thresh, return low + hi64.
 *
 * Build & run:  cc -O2 -o gen_rng_vectors gen_rng_vectors.c &&
 *               ./gen_rng_vectors > rng_vectors.json
 */
#include <stdint.h>
#include <stdio.h>
#include <inttypes.h>

/* ---- splitmix64.c (Vigna, CC0) ---- */
static uint64_t sm_x;
static uint64_t sm_next(void) {
    uint64_t z = (sm_x += 0x9e3779b97f4a7c15);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9;
    z = (z ^ (z >> 27)) * 0x94d049bb133111eb;
    return z ^ (z >> 31);
}

/* ---- xoshiro256plus.c (Blackman & Vigna, CC0) ---- */
static inline uint64_t rotl(const uint64_t x, int k) {
    return (x << k) | (x >> (64 - k));
}
static uint64_t s[4];
static uint64_t xo_next(void) {
    const uint64_t result = s[0] + s[3];
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
}

/* rand_core seed_from_u64: SplitMix64-fill of the state words */
static void xo_seed_from_u64(uint64_t seed) {
    sm_x = seed;
    s[0] = sm_next();
    s[1] = sm_next();
    s[2] = sm_next();
    s[3] = sm_next();
}

/* rand 0.9 UniformInt<u64>::new(low, high) sample (Lemire) */
static uint64_t lemire_sample(uint64_t low, uint64_t range) {
    uint64_t thresh = range ? ((uint64_t)(-(int64_t)range)) % range : 0;
    for (;;) {
        uint64_t x = xo_next();
        unsigned __int128 m = (unsigned __int128)x * (unsigned __int128)range;
        uint64_t lo = (uint64_t)m;
        if (lo >= thresh)
            return low + (uint64_t)(m >> 64);
    }
}

static void print_u64_list(const char *name, uint64_t *v, int n) {
    printf("  \"%s\": [", name);
    for (int i = 0; i < n; i++)
        printf("%s\"%" PRIu64 "\"", i ? ", " : "", v[i]);
    printf("]");
}

int main(void) {
    int i;
    uint64_t v[24];
    printf("{\n");

    /* splitmix64 from seed 0 and seed 0x9E3779B97F4A7C15 */
    sm_x = 0;
    for (i = 0; i < 8; i++) v[i] = sm_next();
    print_u64_list("splitmix64_seed0", v, 8);
    printf(",\n");
    sm_x = 0x9E3779B97F4A7C15ull;
    for (i = 0; i < 8; i++) v[i] = sm_next();
    print_u64_list("splitmix64_seed_golden_gamma", v, 8);
    printf(",\n");

    /* xoshiro256+ from raw state {1,2,3,4} */
    s[0] = 1; s[1] = 2; s[2] = 3; s[3] = 4;
    for (i = 0; i < 16; i++) v[i] = xo_next();
    print_u64_list("xoshiro256plus_state_1234", v, 16);
    printf(",\n");

    /* xoshiro256+ seeded via seed_from_u64 with gfasort's seed 9399220
     * (src/sgd.rs:231) and with 9399220 + 1 (the tid-1 worker) */
    xo_seed_from_u64(9399220);
    for (i = 0; i < 16; i++) v[i] = xo_next();
    print_u64_list("xoshiro256plus_seed_9399220", v, 16);
    printf(",\n");
    xo_seed_from_u64(9399221);
    for (i = 0; i < 8; i++) v[i] = xo_next();
    print_u64_list("xoshiro256plus_seed_9399221", v, 8);
    printf(",\n");

    /* Lemire uniform ints: Uniform::new(0, n) streams over the seeded
     * generator, for range values exercising thresh == 0 (powers of
     * two) and thresh != 0 */
    uint64_t ranges[4] = {10, 1u << 16, 12345678901ull, 3};
    const char *names[4] = {"lemire_0_10", "lemire_0_65536",
                            "lemire_0_12345678901", "lemire_0_3"};
    for (int r = 0; r < 4; r++) {
        xo_seed_from_u64(9399220);
        for (i = 0; i < 12; i++) v[i] = lemire_sample(0, ranges[r]);
        print_u64_list(names[r], v, 12);
        printf(",\n");
    }

    /* 53-bit f64 convention: (x >> 11) * 2^-53 of the seeded stream,
     * printed as IEEE bit patterns for bit-exact comparison */
    xo_seed_from_u64(9399220);
    for (i = 0; i < 8; i++) {
        double d = (double)(xo_next() >> 11) * (1.0 / 9007199254740992.0);
        union { double d; uint64_t u; } pun;
        pun.d = d;
        v[i] = pun.u;
    }
    print_u64_list("f64_bits_seed_9399220", v, 8);
    printf("\n}\n");
    return 0;
}
