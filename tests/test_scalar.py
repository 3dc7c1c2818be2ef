"""Golden scalar cases from FIXTURES.md §5 — the reference's
highest-bug-density expressions, tested without I/O."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from ironman_medallion_lakehouse_spark.functions.scalar import (
    athlete_natural_key,
    normalize_dash_to_null,
    parse_division,
    parse_time_to_seconds,
    split_person_name,
    status_flags,
)


def _eval(spark, col, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_parse_time_golden(spark):
    rows = [("8:06:22",), ("0:03:06",), (None,), ("0:00:00",), ("5:30",), ("0:47:50",)]
    out = _eval(spark, parse_time_to_seconds(F.col("t")), rows, "t string")
    assert out == [29182, 186, None, None, 19800, 2870]


def test_dash_normalize(spark):
    df = spark.createDataFrame([Row(a="-", b="x"), Row(a="1", b="-")])
    out = normalize_dash_to_null(df).collect()
    assert out[0].a is None and out[0].b == "x"
    assert out[1].a == "1" and out[1].b is None


def test_split_name(spark):
    first, last = split_person_name(F.col("n"))
    rows = [("Lucy Charles-Barclay",), ("Ironman",), ("Jan Van Der Berg",)]
    df = spark.createDataFrame(rows, "n string").select(
        first.alias("f"), last.alias("l")
    )
    out = [(r.f, r.l) for r in df.collect()]
    assert out[0] == ("Lucy", "Charles-Barclay")
    assert out[1] == ("Ironman", None)
    # reference keeps only the FINAL token as last name
    assert out[2] == ("Jan", "Berg")


def test_natural_key(spark):
    key = athlete_natural_key(F.col("n"), F.col("c"))
    rows = [("Sam Laidlow", "FR"), ("X", None), ("Lucy-Anne O'Brien", "IE")]
    out = _eval(spark, key, rows, "n string, c string")
    assert out == ["samlaidlow_fr", "x_unknown", "lucyanneobrien_ie"]


def test_parse_division(spark):
    cols = parse_division(F.col("d"))
    df = spark.createDataFrame([("M18-24",), ("FPRO",), ("XC",)], "d string").select(
        cols["gender"].alias("g"),
        cols["is_professional"].alias("p"),
        cols["age_group_start"].alias("s"),
        cols["age_group_end"].alias("e"),
    )
    out = [tuple(r) for r in df.collect()]
    assert out[0] == ("M", False, 18, 24)
    assert out[1] == ("F", True, None, None)
    assert out[2] == ("UNKNOWN", False, None, None)


def test_status_flags(spark):
    flags = status_flags(F.col("d"))
    df = spark.createDataFrame(
        [("Finisher",), ("DNF",), ("DNS",), ("DQ",)], "d string"
    ).select(*[v.alias(k) for k, v in flags.items()])
    rows = df.collect()
    assert rows[0].is_finisher and not rows[0].is_dnf
    assert rows[1].is_dnf
    assert rows[2].is_dns
    assert rows[3].is_dq


def test_canonical_url_golden_cases(spark):
    """Golden canonicalization cases — each branch exercised: case
    folding (scheme+host only), www./default-port strip (but NOT a
    default port on the wrong scheme), fragment drop, tracking-param
    drop, param sort, trailing-slash strip, interior slashes kept."""
    from pyspark.sql import functions as F

    from ironman_medallion_lakehouse_spark.functions.text import canonical_url

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&b=2&a=1#frag",
         "http://example.com/Path?a=1&b=2"),
        ("https://Sub.Example.com:443/p?a=1&utm_campaign=c&z=9",
         "https://sub.example.com/p?a=1&z=9"),
        ("https://example.com/a//deep/page/?fbclid=abc",
         "https://example.com/a//deep/page"),
        ("http://example.com", "http://example.com"),
        ("https://example.com/path?b=2&a=1", "https://example.com/path?a=1&b=2"),
        # default port on the WRONG scheme is a different origin: kept
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("https://example.com/?gclid=zzz", "https://example.com"),
        ("  https://example.com/x  ", "https://example.com/x"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "i long, u string")
    got = {r.i: r.c for r in df.select("i", canonical_url("u").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_strip_html_golden(spark):
    from pyspark.sql import Row

    from ironman_medallion_lakehouse_spark.functions.text import strip_html

    cases = [
        (
            "<html><head><style>p{color:red}</style>"
            "<SCRIPT type='x'>var a=1;\nif(a<2){a++}</SCRIPT></head>"
            "<body><!-- nav\nstuff --><p>Hello &amp; welcome</p>"
            "<a href='x'>world</a>&nbsp;&#39;quoted&#39;</body></html>",
            "Hello & welcome world 'quoted'",
        ),
        ("no markup at all", "no markup at all"),
        ("<p>multi\n  line</p>\t<div>text</div>", "multi line text"),
        ("<noscript>enable js</noscript>real", "real"),
        ("a &lt;tag&gt; literal &quot;q&quot;", 'a <tag> literal "q"'),
    ]
    df = spark.createDataFrame([Row(i=i, t=t) for i, (t, _) in enumerate(cases)])
    got = {r.i: r.s for r in df.select("i", strip_html("t").alias("s")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)
