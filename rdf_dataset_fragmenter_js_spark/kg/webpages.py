"""Deterministic synthetic Common-Crawl-style web-page table.

Schema per ``BASELINE.json input_hint``:
(url string, warc_ts timestamp, html binary, text string, lang string).

Generated fully distributed — ``spark.range(n)`` plus pure column
expressions (md5-derived index selection), no driver-side row lists — so the
same generator scales from the 200-row pytest fixture to the multi-million
row bench input. Page text embeds seeded SVO sentences over a closed entity
pool (with surface-form variants to exercise canonicalization), so the
expected (subj, pred, obj) set is known.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Canonical entities with alias surface forms (alias → same canonical
# entity). Aliases are abbreviation-style (initials, legal-form suffixes) so
# the string-level canonicalization rule (token blocking + n-gram
# containment) resolves them without an external KB; the canonical id equals
# the lexicographic-min normalized form, slugged.
PERSONS = [
    ("alice_johnson", ["Alice Johnson", "A. Johnson", "Alice R. Johnson"]),
    ("bob_smith", ["Bob Smith", "B. Smith"]),
    ("carol_diaz", ["Carol Diaz", "C. Diaz"]),
    ("david_lee", ["David Lee", "D. Lee"]),
    ("emma_brown", ["Emma Brown", "E. Brown"]),
]
ORGS = [
    ("acme_corporation", ["Acme Corp", "Acme Corporation"]),
    ("globex_incorporated", ["Globex Inc", "Globex Incorporated"]),
    ("initech_llc", ["Initech", "Initech Llc"]),
    ("umbrella_company", ["Umbrella Co", "Umbrella Company"]),
]
CITIES = [
    ("springfield", ["Springfield"]),
    ("shelbyville", ["Shelbyville"]),
    ("ogdenville", ["Ogdenville"]),
]
PREDICATES = [
    ("works_for", "works for"),
    ("founded", "founded"),
    ("lives_in", "lives in"),
    ("acquired", "acquired"),
]

#: flat alias lists (deterministic order) used by the column-expression picker
_PERSON_ALIASES = [(a, c) for c, aliases in PERSONS for a in aliases]
_ORG_ALIASES = [(a, c) for c, aliases in ORGS for a in aliases]
_CITY_ALIASES = [(a, c) for c, aliases in CITIES for a in aliases]

FILLER = (
    "This page is part of a synthetic crawl corpus. "
    "It contains plain declarative statements for extraction testing."
)


def _pick(idx_col, pairs: list[tuple[str, str]], salt: str):
    """Deterministic alias selection: md5(salt || idx) mod len(pairs)."""
    n = len(pairs)
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), idx_col.cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % n
    )
    expr = None
    for i, (alias, _) in enumerate(pairs):
        expr = F.when(bucket == i, F.lit(alias)) if expr is None else expr.when(bucket == i, F.lit(alias))
    return expr


def _pick_pred(idx_col, salt: str):
    n = len(PREDICATES)
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), idx_col.cast("string")).cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % n
    )
    expr = None
    for i, (_, phrase) in enumerate(PREDICATES):
        expr = F.when(bucket == i, F.lit(phrase)) if expr is None else expr.when(bucket == i, F.lit(phrase))
    return expr


def synthetic_webpages(spark: SparkSession, n: int, pods: int = 50) -> DataFrame:
    """Generate *n* deterministic pages. Each page carries two SVO sentences
    (person–pred–org, person–'lives in'–city) plus boilerplate; the html
    wraps the text in nav/article/footer chrome."""
    df = spark.range(n).withColumnRenamed("id", "i")
    i = F.col("i")

    subj1 = _pick(i, _PERSON_ALIASES, "s1:")
    pred1 = _pick_pred(i, "p1:")
    obj1 = _pick(i, _ORG_ALIASES, "o1:")
    subj2 = _pick(i, _PERSON_ALIASES, "s2:")
    obj2 = _pick(i, _CITY_ALIASES, "o2:")

    sentence1 = F.concat(subj1, F.lit(" "), pred1, F.lit(" "), obj1, F.lit("."))
    sentence2 = F.concat(subj2, F.lit(" lives in "), obj2, F.lit("."))
    text = F.concat(
        F.lit(FILLER + " "), sentence1, F.lit(" "), sentence2
    )

    url = F.concat(
        F.lit("http://ex.org/pods/"),
        (i % pods).cast("string"),
        F.lit("/page/"),
        i.cast("string"),
    )
    warc_ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=i.cast("double"))
    html = F.concat(
        F.lit("<html><head><title>Synthetic page "),
        i.cast("string"),
        F.lit("</title></head><body><nav><a href=\"/\">home</a> | <a href=\"/about\">about</a></nav>"),
        F.lit("<article><p>"),
        text,
        F.lit("</p></article><footer>generated corpus &copy; 2026</footer></body></html>"),
    ).cast("binary")

    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )


#: the north-rule input contract (BASELINE.json input_hint)
PAGE_COLUMNS = {"url", "warc_ts", "html", "text", "lang"}


def read_pages(spark: SparkSession, source: str, format: str = "parquet") -> DataFrame:
    """North-rule input reader: a Common-Crawl-style web-page table with
    columns (url string, warc_ts timestamp, html binary, text string,
    lang string).

    ``format='iceberg'`` loads an Iceberg table (``spark.read.format(
    'iceberg').load(name)``) — requires ``iceberg-spark-runtime`` on the
    cluster classpath (not bundled in this sandbox, so local tests use
    ``format='parquet'`` over the same schema: parquet is the file layer an
    Iceberg table manages; every downstream operator is identical). The
    schema contract is validated eagerly so a mis-pointed table fails at
    submit time, not three stages into the pipeline."""
    if format == "iceberg":
        df = spark.read.format("iceberg").load(source)
    elif format == "parquet":
        df = spark.read.parquet(source)
    else:
        raise ValueError(f"unsupported page-table format: {format}")
    missing = PAGE_COLUMNS - set(df.columns)
    if missing:
        raise ValueError(
            f"page table {source!r} is missing required columns {sorted(missing)}; "
            f"expected at least {sorted(PAGE_COLUMNS)} (BASELINE.json input_hint)"
        )
    return df


def alias_to_canonical() -> dict[str, str]:
    """Ground-truth alias → canonical map (for P/R scoring in tests)."""
    out = {}
    for pool in (PERSONS, ORGS, CITIES):
        for canon, aliases in pool:
            for a in aliases:
                out[a] = canon
    return out
