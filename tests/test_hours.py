"""Opening-hours + condition parser parity (opening_hours.rs tests
354-426 mirrored, condition.rs tests 640-711 mirrored, plus the grammar
edges the reference exercises implicitly)."""

import pandas as pd
import pytest

from routers_spark.functions.hours import (
    parse_condition,
    parse_opening_hours,
    parse_opening_hours_pdf,
    parse_opening_hours_tags,
)


def test_24_7():
    rows = parse_opening_hours("24/7")
    assert rows == [{"rule": 0, "closed": False, "wd_kind": None,
                     "weekdays": None, "tr": 0, "start_h": 0, "start_m": 0,
                     "end_h": 23, "end_m": 59}]
    assert parse_opening_hours("24/7") == parse_opening_hours(" 24/7 ")


def test_simple_time_range():
    rows = parse_opening_hours("09:00-17:00")
    assert len(rows) == 1
    r = rows[0]
    assert (r["start_h"], r["start_m"], r["end_h"], r["end_m"]) == (9, 0, 17, 0)
    assert r["weekdays"] is None and not r["closed"]


def test_multiple_hours():
    # opening_hours.rs:374-388
    rows = parse_opening_hours("Mo-Fr 07:00-9:00,16:00-20:00")
    assert len(rows) == 2
    assert all(r["wd_kind"] == "range" and r["weekdays"] == "Mo-Fr"
               for r in rows)
    assert (rows[0]["start_h"], rows[0]["end_h"]) == (7, 9)
    assert (rows[1]["start_h"], rows[1]["end_h"]) == (16, 20)
    assert [r["tr"] for r in rows] == [0, 1]


def test_multiple_rules():
    rows = parse_opening_hours("Mo-Fr 09:00-17:00; Sa 10:00-14:00")
    assert [r["rule"] for r in rows] == [0, 1]
    assert rows[1]["wd_kind"] == "single" and rows[1]["weekdays"] == "Sa"


def test_closed_and_off():
    for s in ("closed", "off", "CLOSED", " Off "):
        rows = parse_opening_hours(s)
        assert rows == [{"rule": 0, "closed": True, "wd_kind": None,
                         "weekdays": None, "tr": -1, "start_h": None,
                         "start_m": None, "end_h": None, "end_m": None}]


def test_weekday_forms():
    assert parse_opening_hours("Mo")[0]["weekdays"] == "Mo"
    assert parse_opening_hours("monday")[0]["weekdays"] == "Mo"
    rows = parse_opening_hours("Mo,We,Fr 08:30-17:30")
    assert rows[0]["wd_kind"] == "list"
    assert rows[0]["weekdays"] == "Mo,We,Fr"
    assert (rows[0]["start_m"], rows[0]["end_m"]) == (30, 30)
    # 'Su closed' is NOT a closed rule — 'closed' only matches the whole
    # rule string (rs:180); it's an unparseable weekday part, skipped
    rows = parse_opening_hours("Sa 10:00-14:00; Su closed")
    assert rows[1] == {"rule": 1, "closed": False, "wd_kind": "single",
                       "weekdays": "Su", "tr": -1, "start_h": None,
                       "start_m": None, "end_h": None, "end_m": None}


def test_single_time_point_spans_one_hour():
    r = parse_opening_hours("09:30")[0]
    assert (r["start_h"], r["start_m"], r["end_h"], r["end_m"]) == (9, 30, 10, 30)
    # hour 23 wraps to 0, minute kept (rs:276-283)
    r = parse_opening_hours("23:15")[0]
    assert (r["start_h"], r["end_h"], r["end_m"]) == (23, 0, 15)


def test_hour_only_and_24():
    # '9-17' has no colon so it never looks like a time; it's a failed
    # weekday part, silently skipped by find_map — the rule survives as
    # weekday-only with NO times (rs:195-213)
    rows = parse_opening_hours("Mo-Fr 9-17")
    assert rows == [{"rule": 0, "closed": False, "wd_kind": "range",
                     "weekdays": "Mo-Fr", "tr": -1, "start_h": None,
                     "start_m": None, "end_h": None, "end_m": None}]
    # but 'Tu-Fr 00:00-24:00' is valid — hour 24 passes Time::new
    r = parse_opening_hours("Tu-Fr 00:00-24:00")[0]
    assert (r["end_h"], r["end_m"]) == (24, 0)


def test_errors_fail_whole_parse():
    assert parse_opening_hours("Mo-Fr 25:00-26:00") is None   # hour > 24
    assert parse_opening_hours("Mo-Fr 09:61-10:00") is None   # minute > 59
    assert parse_opening_hours("Mo-Fr 09:00-17:00; ???") is None
    assert parse_opening_hours("") is None
    assert parse_opening_hours("1:2:3") is None  # 3 time sections
    # a 3-section weekday range FAILS parse_weekday_range but is skipped
    # by find_map — the rule survives on its times with weekdays None
    rows = parse_opening_hours("Mo-Tu-We 09:00-17:00")
    assert rows[0]["weekdays"] is None and rows[0]["start_h"] == 9


def test_latching_time_scan():
    # once a part looks like a time, later parts are time-side — a
    # trailing weekday becomes a broken time range (rs:195-201)
    assert parse_opening_hours("09:00-17:00 Mo") is None
    # weekday failures before the latch are silently skipped (find_map)
    rows = parse_opening_hours("foo Mo 09:00-17:00")
    assert rows[0]["weekdays"] == "Mo"


def test_pdf_and_spark_op(spark):
    pdf = pd.DataFrame({
        "id": [1, 2, 3, 4],
        "value": ["24/7", "Mo-Fr 09:00-17:00; Sa 10:00-14:00",
                  "not hours", "closed"],
    })
    out = parse_opening_hours_pdf(pdf)
    assert list(out[out["id"] == 3]["ok"]) == [False]
    assert len(out[out["id"] == 2]) == 2
    sdf = spark.createDataFrame(pdf)
    got = (parse_opening_hours_tags(sdf).toPandas()
           .sort_values(["id", "rule", "tr"]).reset_index(drop=True))
    want = (out.sort_values(["id", "rule", "tr"]).reset_index(drop=True))
    assert got["weekdays"].fillna("").tolist() == \
        want["weekdays"].fillna("").tolist()
    assert got["ok"].tolist() == want["ok"].tolist()
    assert len(got) == len(want)


# ----------------------------------------------------------- condition.rs

def test_condition_time_date():
    # condition.rs:647-670
    c = parse_condition("Tu-Fr 00:00-24:00")
    assert c["cond_type"] == "time_date" and c["comment"] is None
    assert c["rows"][0]["weekdays"] == "Tu-Fr"
    assert (c["rows"][0]["start_h"], c["rows"][0]["end_h"]) == (0, 24)


def test_condition_season_and_road():
    assert parse_condition("winter")["cond_type"] == "season"
    assert parse_condition("snow") == {"cond_type": "road", "value": "snow"}


def test_condition_vehicle_property():
    c = parse_condition("weight < 7.5")
    assert c == {"cond_type": "vehicle_property", "property": "weight",
                 "op": "<", "value": 7.5, "unit": None}
    c = parse_condition("height<=3.5m")
    assert (c["op"], c["value"], c["unit"]) == ("<=", 3.5, "m")
    # '<=' is FOUND before '<' in the operator scan (condition.rs:457)
    assert parse_condition("length>=5")["op"] == ">="


def test_condition_usage_and_shadowing():
    assert parse_condition("hazmat") == {"cond_type": "vehicle_usage",
                                         "usage": "hazmat"}
    c = parse_condition("occupants>1")
    assert (c["usage"], c["op"], c["count"]) == ("occupants", ">", 1)
    # the Load fallback shadows user-group/purpose/stay (condition.rs:
    # 484-509 always Ok) — mirrored deliberately
    assert parse_condition("doctor") == {"cond_type": "vehicle_usage",
                                         "usage": "load", "load": "doctor"}
    assert parse_condition("stay < 2 hours")["usage"] == "load"
    # …except the occupants-bad-count Err path, which lands on Raw
    assert parse_condition("occupants>x") == {"cond_type": "raw",
                                              "value": "occupants>x"}


def test_condition_combined_and_parens():
    c = parse_condition("destination @ Sa-Su AND weight>7")
    assert c["cond_type"] == "combined" and c["op"] == "AND"
    assert c["right"]["property"] == "weight"
    c = parse_condition("(wet OR snow)")
    assert c["op"] == "OR"
    assert c["left"] == {"cond_type": "road", "value": "wet"}
    # AND is looked for before OR on the whole string
    c = parse_condition("wet OR snow AND winter")
    assert c["op"] == "AND" and c["left"]["cond_type"] == "combined"


def test_condition_comment():
    c = parse_condition('Mo-Fr 06:00-20:00 "bij grote verkeersdrukte"')
    assert c["cond_type"] == "time_date"
    assert c["comment"] == "bij grote verkeersdrukte"
