"""Mojibake repair (functions/encoding.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spider_spark.functions.encoding import fix_mojibake, fix_mojibake_udf


def corrupt_latin1(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def corrupt_cp1252(s: str) -> str:
    # the sloppy decode: undefined cp1252 bytes read as their C1 control
    out = []
    for b in s.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


class TestFixMojibake:
    def test_classic_artifacts(self):
        assert fix_mojibake("cafÃ©") == "café"
        assert fix_mojibake("itâ€™s here â€” now") == "it’s here — now"
        assert fix_mojibake("Ã¼ber StraÃŸe") == "über Straße"

    def test_latin1_roundtrip_inverts(self):
        for s in ["café é è ü ñ", "привіт світ", "日本語テキスト",
                  "mixed ascii + Größe + 中文"]:
            assert fix_mojibake(corrupt_latin1(s)) == s

    def test_cp1252_roundtrip_inverts(self):
        for s in ["it’s “quoted” – dashed…", "€ 99 • bullet"]:
            assert fix_mojibake(corrupt_cp1252(s)) == s

    def test_double_mojibake(self):
        s = "déjà vu"
        assert fix_mojibake(corrupt_latin1(corrupt_latin1(s))) == s

    def test_clean_text_untouched(self):
        for s in ["plain ascii only", "café déjà vu", "für Größe",
                  "привіт", "", "ñandú"]:
            assert fix_mojibake(s) == s
        assert fix_mojibake(None) is None

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=1, max_size=120))
    def test_corrupt_then_fix_is_identity_when_marked(self, s):
        """For any text, latin-1 corruption is inverted exactly — unless
        the ORIGINAL itself looks like mojibake (the repair then keeps
        going past the injected layer, by design)."""
        c = corrupt_latin1(s)
        got = fix_mojibake(c)
        assert got == fix_mojibake(s) or got == s
        # and on non-ascii inputs the injected layer is always peeled
        if s != c:
            assert got != c

    def test_udf_matches_kernel(self, spark):
        rows = [("cafÃ©",), ("plain",), ("â€œqâ€\x9d",), (None,),
                (corrupt_latin1("привіт"),)]
        df = spark.createDataFrame(rows, "text string")
        got = [r["fixed"] for r in
               df.select(fix_mojibake_udf("text").alias("fixed")).collect()]
        assert got == [fix_mojibake(r[0]) for r in rows]

    def test_jvm_corruption_matches_python(self, spark):
        """F.decode(F.encode(x,'UTF-8'),'ISO-8859-1') — the driver query's
        corruption expression — equals the Python latin-1 mis-decode, so
        the oracle's 'repair inverts corruption' claim is well-founded."""
        texts = ["café é", "привіт світ", "ascii", "Größe 中文"]
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = [
            r["c"]
            for r in df.select(
                F.decode(F.encode("text", "UTF-8"), "ISO-8859-1").alias("c")
            ).collect()
        ]
        assert got == [corrupt_latin1(t) for t in texts]
