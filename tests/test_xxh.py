"""Validate the pure-Python XXH64 against Spark's own xxhash64 — the
foundation of the `minhash_neardup_xxhash` expected-output oracle."""

from pyspark.sql import functions as F

from discoverx_spark.functions.xxh import spark_xxhash64_string, xxh64

CASES = [
    "",
    "x",
    "abc",
    "the quick brown fox",                      # > 8 bytes
    "alpha beta gamma delta epsilon zeta",      # > 32 bytes (stripe path)
    "ä ö ü ß",                                  # multi-byte utf-8
    "中文字符串测试内容较长以超过三十二字节",       # 3-byte chars, > 32 bytes
    "exactly8", "exactly8bytes12", "0123456789abcdef0123456789abcdef",
    "tail bytes 123",
]


def test_xxh64_matches_spark_string(spark):
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in CASES:
        assert spark_xxhash64_string(s) == got[s], repr(s)


def test_xxh64_matches_spark_hash_family(spark):
    """The exact production usage: F.xxhash64(shingle, lit(i)) for the
    k-member MinHash family (dedup._hash_fn)."""
    df = spark.createDataFrame([(s,) for s in CASES], "s string")
    for i in (0, 1, 7, 15):
        got = {r.s: r.h for r in
               df.select("s", F.xxhash64("s", F.lit(i)).alias("h")).collect()}
        for s in CASES:
            assert spark_xxhash64_string(s, extra_int=i) == got[s], (s, i)


def test_xxh64_randomized_batch(spark):
    """200 seeded random strings across the length/codepoint space (empty
    to >200 bytes, ascii / latin-1 / CJK / emoji mixes) — every one must
    match Spark, both bare and with the hash-family int fold."""
    import random
    rng = random.Random(42)
    pools = [
        "abcdefghijklmnopqrstuvwxyz 0123456789",
        "äöüßéèêñç ",
        "中文字符测试内容 ",
        "αβγδε абвгд ",
        "🙂🚀🎉 ",
    ]
    cases = []
    for _ in range(200):
        pool = rng.choice(pools)
        n = rng.choice([0, 1, 3, 4, 7, 8, 9, 15, 16, 31, 32, 33, 64, 200])
        cases.append("".join(rng.choice(pool) for _ in range(n)))
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r.s: (r.h0, r.h5) for r in
           df.select("s", F.xxhash64("s").alias("h0"),
                     F.xxhash64("s", F.lit(5)).alias("h5")).collect()}
    for s in cases:
        assert spark_xxhash64_string(s) == got[s][0], repr(s)
        assert spark_xxhash64_string(s, extra_int=5) == got[s][1], repr(s)


def test_xxh64_known_seed_fold(spark):
    # one literal cross-check via SQL, per the validation recipe
    row = spark.sql("SELECT xxhash64('x', 0) AS h").collect()[0]
    assert spark_xxhash64_string("x", extra_int=0) == row.h
    # unsigned core function is stable under seed masking
    assert xxh64(b"abc", 42) == xxh64(b"abc", 42 + (1 << 64))
