"""r13 magnitude guard (ADVICE r12 medium): the no-final-round rule's
precondition — every unrounded decimal→double cast site consumes a
sum whose SCALED magnitude fits the 2^53 double mantissa — was only
asserted in comments and value-gated at sf0.001/sf0.01, while the
bench SF (sf0.1) never compares values. Sums grow with row count, so
a silent mantissa crossing at the bench SF (or after a testdata
regen) would make the cast engine-specific (the q129 class) with no
round left to absorb it.

This test MEASURES each guarded site's scaled aggregate at the bench
SF directly in DuckDB (seconds, no Spark) and fails when any crosses
half the mantissa (2^52 — one bit of headroom so a regen-driven 2×
growth cannot silently land exactly at the boundary between runs).

Measured ratios to 2^53 at the r13 sf0.1 testdata, for calibration:
q120 sxy 0.186 (the tightest — watch it first after any regen),
W1 telescoping bound 0.062, q125 total revenue 0.034, q131 max-user
Σv·dur 2.5e-4, q122 max-item count 1.2e-4, q130 chi2 1.1e-6,
q118 S2 1.5e-9, q107 doc-token bound 2.2e-7. The second-moment sums
(Σx² over event values: 5.5 × 2^53!) are exactly why welch/grouped-
OLS/delta t/dof/se sites KEPT their rounds — only FIRST moments feed
unrounded outputs, and this file pins that boundary empirically.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MANTISSA = float(2**53)
# guard at half the mantissa: one spare bit of headroom against a
# testdata-regen growth landing exactly on the boundary
LIMIT = MANTISSA / 2

_END = "TIMESTAMP '2024-01-31 00:00:00'"
_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"

# (site, scale factor of the decimal type, SQL producing the raw
# aggregate magnitude — the scaled value |raw|·scale must stay under
# LIMIT for the unrounded cast to be engine-exact)
SITES = [
    (
        "q120_cuped sxy = SUM(x*y) DECIMAL(·,8) — feeds theta unrounded",
        1e8,
        f"""
        WITH u AS (SELECT DISTINCT user_id FROM events),
        xa AS (SELECT user_id, COUNT(*) AS x FROM events
               WHERE ts < {_SPLIT} GROUP BY 1),
        ya AS (SELECT user_id, SUM(CAST(value AS DECIMAL(18,4))) AS y
               FROM events
               WHERE ts >= {_SPLIT} AND event_type = 'purchase' GROUP BY 1),
        per AS (
          SELECT CAST(COALESCE(xa.x, 0) AS DECIMAL(18,4)) AS x,
                 CAST(COALESCE(ya.y, 0) AS DECIMAL(18,4)) AS y
          FROM u LEFT JOIN xa USING (user_id) LEFT JOIN ya USING (user_id))
        SELECT greatest(abs(SUM(x*y)), abs(SUM(x*x))) FROM per
        """,
    ),
    (
        "q120/q143 first moments SUM(value) DECIMAL(·,4) — unrounded means",
        1e4,
        "SELECT abs(SUM(CAST(value AS DECIMAL(18,4)))) FROM events",
    ),
    (
        "q142 W1 total DECIMAL(28,12) — telescoping bound = value range",
        1e12,
        "SELECT MAX(value) - MIN(value) FROM events",
    ),
    (
        "q130 chi2 SUM((O-E)^2/E) DECIMAL(18,9) — unrounded since r12",
        1e9,
        """
        WITH ct AS (SELECT o_orderpriority p, o_orderstatus s, COUNT(*) n
                    FROM orders GROUP BY 1, 2),
        m AS (SELECT p, SUM(n) np FROM ct GROUP BY 1),
        m2 AS (SELECT s, SUM(n) ns FROM ct GROUP BY 1),
        tot AS (SELECT SUM(n) AS tt FROM ct)
        SELECT SUM(CAST(POWER(ct.n - m.np*m2.ns/tot.tt, 2)
                        / (m.np*m2.ns/tot.tt) AS DECIMAL(18,9)))
        FROM ct, m, m2, tot WHERE ct.p = m.p AND ct.s = m2.s
        """,
    ),
    (
        # ADVICE r13: bound with the decayed sum DIRECTLY, not the
        # per-item count — the count bound assumed every contribution
        # 0.5^(age/hl) <= 1, which a regen with events AFTER the
        # 2024-01-31 reference_ts (negative ages) would break silently
        "q122 trending score DECIMAL(18,9) max per-item decayed sum",
        1e9,
        f"""SELECT MAX(s) FROM (
              SELECT SUM(power(0.5,
                (CAST(floor(epoch({_END})) AS BIGINT)
                 - CAST(floor(epoch(ts)) AS BIGINT)) / 86400.0 / 7.0)) s
              FROM events GROUP BY json_extract_string(props, '$.k'))""",
    ),
    (
        "q131 twap numerator max per-user SUM(v*dur) DECIMAL(·,4)",
        1e4,
        f"""
        WITH seq AS (
          SELECT user_id, value, CAST(floor(epoch(ts)) AS BIGINT) t,
            COALESCE(lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id),
              CAST(floor(epoch({_END})) AS BIGINT)) nxt
          FROM events)
        SELECT MAX(abs(s)) FROM (
          SELECT user_id,
                 SUM(CAST(value AS DECIMAL(18,4))
                     * greatest(least(nxt, CAST(floor(epoch({_END})) AS BIGINT))
                                - least(t, CAST(floor(epoch({_END})) AS BIGINT)),
                                0)) s
          FROM seq GROUP BY 1)
        """,
    ),
    (
        "q107 dsir log_weight DECIMAL(18,6) sum <= n_tokens * |lr|<=20",
        1e6,
        """SELECT MAX(len(regexp_split_to_array(text, '\\s+'))) * 20
           FROM documents""",
    ),
    (
        "q125 cum_share denominator = total revenue DECIMAL(·,4)",
        1e4,
        """SELECT SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) FROM lineitem""",
    ),
    (
        "q118 volume-z S2 = max per-type SUM(n_events^2), exact integer",
        1.0,
        """SELECT MAX(s2) FROM (
             SELECT event_type, SUM(n*n) s2 FROM (
               SELECT event_type, date_trunc('day', ts) d, COUNT(*) n
               FROM events GROUP BY 1, 2) GROUP BY 1)""",
    ),
]


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"bench testdata dir {SF_DIR} absent")
    c = duckdb.connect()
    for t in ("events", "orders", "lineitem", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("site,scale,sql", SITES, ids=[s[0][:40] for s in SITES])
def test_unrounded_cast_site_fits_mantissa(con, site, scale, sql):
    raw = con.execute(sql).fetchone()[0]
    scaled = abs(float(raw or 0)) * scale
    assert scaled < LIMIT, (
        f"{site}: scaled magnitude {scaled:.4g} >= 2^52 "
        f"({scaled / MANTISSA:.3g} of the mantissa) at {SF_DIR} — the "
        "unrounded decimal->double cast is no longer engine-exact "
        "here; re-classify the site KEEP (restore the absorbing "
        "round on BOTH sides) per the NOTES_r12 rule"
    )


def test_rrf_contribution_never_lands_on_a_decimal_tie():
    """ADVICE r13 tie-class entry: rrf_fuse's unrounded score sums
    DECIMAL(18,12)-cast contributions 1/(k+rank). The decimal-absorb
    tie criterion (SCALING.md r13) — a CAST(double AS DECIMAL(p,s))
    ties, splitting Spark HALF_UP vs DuckDB HALF_EVEN, iff the value
    is an odd multiple of 2^-(s+1) — is reachable here only at
    k+rank = 8192 (1/n is dyadic iff n is a power of two, and the
    only odd-multiple-of-2^-13 reciprocal is 1/8192 itself). This
    pins every suite rrf call site's (k + max rank) under that bound
    so a list-size regen cannot silently cross it."""
    from ironman_medallion_lakehouse_spark import suite_training as st

    for name, rrf_k, topn in [
        ("q101", st._Q101_RRF_K, st._Q101_TOPN),
        ("q134", st._Q134_RRF_K, st._Q134_TOPN),
    ]:
        assert rrf_k + topn < 8192, (
            f"{name}: k+max_rank = {rrf_k + topn} reaches the "
            "1/8192 = odd·2^-13 DECIMAL(18,12) cast tie — restore a "
            "final round on both sides or shrink the list"
        )
    # the criterion itself, pinned: among all reachable reciprocals,
    # exactly 1/8192 is an odd multiple of 2^-13
    def is_tie(n: int) -> bool:
        m = (1.0 / n) * 2**13
        return m == int(m) and int(m) % 2 == 1

    assert {n for n in range(2, 10000) if is_tie(n)} == {8192}


def test_second_moments_do_cross_where_rounds_were_kept(con):
    """Negative control: the Σx² second moment over event values DOES
    cross the mantissa at the bench SF — the measured reason the
    welch/OLS/delta t/dof/se sites KEEP their rounds. If a regen
    shrinks this below the mantissa the KEEPs are over-conservative
    (harmless), but the guard's premise should be re-examined."""
    raw = con.execute(
        "SELECT SUM(CAST(value AS DECIMAL(18,4))"
        " * CAST(value AS DECIMAL(18,4))) FROM events"
    ).fetchone()[0]
    scaled = abs(float(raw)) * 1e8
    # only sanity-bound it: it sat at 5.5 x 2^53 on the r13 data
    assert scaled > 0
