"""Property-based normalization invariants (SURVEY §5.5): randomized
raw listing records through normalize_listings must always satisfy the
schema contract — no crash, no invalid state — regardless of input
garbage. Hypothesis drives the raw-field generators; each case batch
runs through ONE Spark job (per-example Spark jobs would be 100x
slower than the property is worth)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from real_estate_bigdata_spark.functions.normalize import normalize_listings
from real_estate_bigdata_spark.schema import RAW_LISTING_SCHEMA

_RAW_COLS = [f.name for f in RAW_LISTING_SCHEMA.fields]

# generators biased toward the reference's real formats plus garbage
_dates = st.one_of(
    st.just("hôm nay"), st.just("hôm qua"),
    st.dates(datetime.date(1990, 1, 1), datetime.date(2030, 1, 1)).map(
        lambda d: d.strftime("%d/%m/%Y")
    ),
    st.text(max_size=12),
    st.none(),
)
_prices = st.one_of(
    st.floats(0.1, 500, allow_nan=False).map(lambda x: f"{x:.1f} tỷ".replace(".", ",")),
    st.integers(1, 999).map(lambda x: f"{x} triệu"),
    st.just("Thỏa thuận"), st.just("thỏa thuận nhé"),
    st.text(max_size=15), st.none(),
)
_areas = st.one_of(
    st.floats(1, 10000, allow_nan=False).map(lambda x: f"{x:.1f} m2".replace(".", ",")),
    st.text(max_size=10), st.none(),
)
_dims = st.one_of(
    st.tuples(st.floats(1, 50, allow_nan=False), st.floats(1, 50, allow_nan=False)).map(
        lambda t: f"Kích thước: {t[0]:.1f}x{t[1]:.1f}m".replace(".", ",")
    ),
    st.just("---"), st.text(max_size=12), st.none(),
)
_free = st.one_of(st.text(max_size=20), st.none())

_record = st.fixed_dictionaries(
    {
        "raw_post_date": _dates,
        "duong_pho": _free,
        "phuong_xa": _free,
        "quan_huyen": _free,
        "thanh_pho": _free,
        "loai_bds": st.just("Nhà đất"),
        "raw_price": _prices,
        "raw_area": _areas,
        "raw_kich_thuoc": _dims,
        "duong_truoc_nha": _free,
        "so_tang": _free,
        "so_phong_ngu": _free,
        "cho_de_xe": st.one_of(st.just("Có"), st.text(max_size=5), st.none()),
        "source": st.just("alonhadat"),
        "link": st.none(),
        "title": st.none(),
    }
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.lists(_record, min_size=1, max_size=8))
def test_normalization_invariants(spark, records):
    rows = [tuple(r[c] for c in _RAW_COLS) for r in records]
    out = normalize_listings(
        spark.createDataFrame(rows, RAW_LISTING_SCHEMA)
    ).collect()
    assert len(out) == len(rows)
    today = datetime.date.today()
    for r in out:
        # date always resolves (relative terms, parseable, or today)
        assert isinstance(r.post_date, datetime.date)
        assert r.post_date <= today or r.post_date.year >= 1990
        # price: non-negative or absent; status always one of the enum
        assert r.price_status in ("listed", "negotiable", "unknown")
        if r.price_ty is not None:
            assert r.price_ty >= 0.0
            assert r.price_status == "listed"
        if r.price_status == "listed":
            assert r.price_ty is not None
        # numeric fields: parsed-or-null, never crash
        for v in (r.area, r.chieu_ngang, r.chieu_dai, r.duong_truoc_nha):
            assert v is None or v >= 0.0
        # district: no leading/trailing ASCII spaces (Spark trim
        # semantics: 0x20 only — Python's strip() also eats control
        # chars like \x1f, a documented divergence from the reference
        # mapper that only matters for control-char-only keys)
        if r.quan_huyen is not None:
            assert r.quan_huyen == r.quan_huyen.strip(" ")
        assert isinstance(r.cho_de_xe, bool)
