"""D4 text-analysis behavioral tests (signals without a SQL oracle)."""

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


class TestCompressionRatio:
    """D4 compression-ratio signal: repetition compresses, novelty
    doesn't; the ratio is deterministic for a fixed zlib level."""

    def test_repetitive_vs_novel_text(self):
        """The signal itself (independent of Spark): pure repetition
        lands far below the 0.3 flag threshold, novel text far above."""
        import zlib

        def ratio(s: str) -> float:
            b = s.encode()
            return len(zlib.compress(b, 6)) / len(b)

        repetitive = ratio("spam " * 200)
        novel = ratio(" ".join(f"w{i}x{i * 7 % 97}" for i in range(200)))
        assert repetitive < 0.05
        assert novel > 0.3

    def test_query_runs_and_is_deterministic(self, spark):
        a = REGISTRY["d4_compression_ratio"].fn(spark, SF).collect()
        b = REGISTRY["d4_compression_ratio"].fn(spark, SF).collect()
        assert len(a) > 0
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        for r in a:
            assert 0 < r["compression_ratio"] <= 1.5  # deflate overhead cap
            assert r["too_compressible"] == (r["compression_ratio"] < 0.3)
