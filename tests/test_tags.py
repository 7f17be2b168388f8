"""OSM maxspeed parsing (functions/tags.py) vs the reference's own test
cases (speed_limit/test.rs) and the grammar's edge cases."""

from __future__ import annotations

import pandas as pd
import pytest

from routers_spark.functions.tags import (
    parse_maxspeed_pdf,
    parse_maxspeed_tags,
    parse_restriction,
)


def _rows(cases: list[tuple[str, str]]) -> pd.DataFrame:
    return pd.DataFrame({
        "way_id": range(len(cases)),
        "key": [k for k, _ in cases],
        "value": [v for _, v in cases],
    })


def _one(key: str, value: str) -> pd.DataFrame:
    return parse_maxspeed_pdf(_rows([(key, value)]))


def test_reference_cases():
    # test.rs test_parsing_speed_limit: maxspeed=50 → blanket 50 km/h
    out = _one("maxspeed", "50")
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.lane, r.kmh, r.kind) == (-1, 50, "kmh")
    assert r.transport_mode is None and r.direction is None

    # test.rs test_parsing_speed_limit_mph: 20 mph → 32 km/h (truncating)
    r = _one("maxspeed", "20 mph").iloc[0]
    assert (r.kmh, r.kind) == (32, "mph")

    # test.rs test_parsing_speed_limit_transport_hgv: maxspeed:hgv
    r = _one("maxspeed:hgv", "20 mph").iloc[0]
    assert r.transport_mode == "hgv" and r.direction is None

    # directionality + mode sections resolve independently
    r = _one("maxspeed:hgv:backward", "40").iloc[0]
    assert r.transport_mode == "hgv" and r.direction == "backward"


def test_units_and_specials():
    assert _one("maxspeed", "10 knots").iloc[0].kmh == 18  # floor(18.52)
    assert _one("maxspeed", "30 kph").iloc[0].kmh == 30
    # unknown unit word defaults to km/h (speed.rs:66)
    assert _one("maxspeed", "30 km/h").iloc[0].kmh == 30
    # digits REQUIRED: bare specials do not parse (limit.rs:77-89)
    assert len(_one("maxspeed", "walk")) == 0
    assert len(_one("maxspeed", "none")) == 0
    # but a non-numeric KIND as the unit word carries no km/h
    r = _one("maxspeed", "5 walk").iloc[0]
    assert r.kind == "walk" and pd.isna(r.kmh)
    # NonZeroU16 range: 0 and >65535 fail to parse entirely
    assert len(_one("maxspeed", "0")) == 0
    assert len(_one("maxspeed", "70000")) == 0


def test_conditionals():
    # `60 @ (22:00-06:00)` — speed parses (unit token '@' → default kph),
    # condition string surfaced raw
    r = _one("maxspeed:conditional", "60 @ (22:00-06:00)").iloc[0]
    assert (r.kmh, r.condition) == (60, "22:00-06:00")


def test_lanes_split_terminator_semantics():
    # per-lane with an empty middle slot: positions preserved
    out = _one("maxspeed:lanes", "100||80")
    assert list(out.lane) == [0, 1, 2]
    assert list(out.kmh.fillna(-1)) == [100, -1, 80]
    # ONE trailing empty element dropped (Rust split_terminator)
    out = _one("maxspeed:lanes", "100|80|")
    assert list(out.lane) == [0, 1]
    # lanes + conditional key ("conditional" subsumes, limit.rs:126-130)
    out = _one("maxspeed:lanes:conditional",
               "20 @ (Mo-Fr 06:00-20:00)|10")
    assert list(out.kmh) == [20, 10]
    assert out.iloc[0].condition == "Mo-Fr 06:00-20:00"
    assert pd.isna(out.iloc[1].condition)


def test_restriction_key_grammar():
    assert parse_restriction("maxspeed") == (None, None)
    assert parse_restriction("maxspeed:bus:forward") == ("bus", "forward")
    # two-token strum modes are UNREACHABLE from key parsing: the
    # reference folds over split(':'), so a section never contains ':'
    # (restriction.rs:52-66) — 'ski'/'hazmat' match first
    assert parse_restriction("maxspeed:ski:nordic") == ("ski", None)
    assert parse_restriction("maxspeed:hazmat:water") == ("hazmat", None)


def test_non_maxspeed_keys_ignored_and_spark_op(spark):
    pdf = _rows([
        ("maxspeed", "50"),
        ("highway", "residential"),     # ignored
        ("maxspeed:lanes", "60|40"),
        ("maxspeed", "not_a_speed"),    # unparsable → contributes nothing
    ])
    out = parse_maxspeed_tags(spark.createDataFrame(pdf)).toPandas()
    assert len(out) == 3
    assert set(out["way_id"]) == {0, 2}


def test_blanket_unparsable_dropped_lane_slot_kept():
    assert len(_one("maxspeed", "(no speed here)")) == 0
    out = _one("maxspeed:lanes", "abc|50")
    assert list(out.lane) == [0, 1]
    assert pd.isna(out.iloc[0].kmh) and out.iloc[1].kmh == 50


def test_null_and_empty_values_are_safe():
    """Real tag tables carry nulls: a null key/value must not kill the
    batch, and maxspeed:lanes='' yields ZERO lane entries (Rust
    split_terminator('') is empty)."""
    pdf = pd.DataFrame({
        "way_id": [0, 1, 2, 3, 4],
        "key": ["maxspeed", None, "maxspeed:lanes", "maxspeed:lanes",
                "maxspeed:lanes"],
        "value": ["50", "60", None, "", "70|30"],
    })
    out = parse_maxspeed_pdf(pdf)
    assert list(out.way_id) == [0, 4, 4]
    assert list(out.kmh) == [50, 70, 30]


def test_access_parse_reference_cases(spark):
    """access.rs from_key_value doc cases + grammar rules, and the parse
    output drives the already-tested runtime eval end-to-end."""
    from routers_spark.functions.tags import (
        parse_access_pdf,
        parse_access_tags,
    )
    from routers_spark.graph.access import TripProfile, accessible

    pdf = pd.DataFrame({
        "way_id": range(8),
        "key": ["bicycle", "motor_vehicle", "access", "hgv:forward",
                "building", "bicycle", None, "vehicle:both_ways"],
        "value": ["no", "destination", "private", "no", "yes",
                  "sometimes", "yes", "delivery"],
    })
    out = parse_access_pdf(pdf)
    got = {r.way_id: (r.mode, r.direction, r.value)
           for r in out.itertuples()}
    assert got[0] == ("bicycle", "both", "no")
    assert got[1] == ("motor_vehicle", "both", "destination")
    assert got[2] == ("access", "both", "private")
    assert got[3] == ("hgv", "forward", "no")
    assert got[7] == ("vehicle", "both", "delivery")
    # non-mode key, invalid value, null key all contribute nothing
    assert set(got) == {0, 1, 2, 3, 7}

    # ingest → eval lifecycle: the parsed triples drive accessible()
    tags = [got[1]]  # motor_vehicle=destination
    assert not accessible(tags, TripProfile("motorcar"), fwd=True)
    assert accessible(tags, TripProfile("foot"), fwd=True)

    # Spark op shape
    sdf = parse_access_tags(spark.createDataFrame(pdf)).toPandas()
    assert len(sdf) == 5
