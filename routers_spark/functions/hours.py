"""OSM opening-hours + conditional-restriction parsing — the last big
tag-parser surface the earlier rounds scoped out (reference
``osm/parsers/primitives/opening_hours.rs`` 1-426 and ``condition.rs``).
The reference keeps *evaluation* runtime-side; this is parse parity:
the condition strings ``functions/tags.py`` already extracts from
``maxspeed:conditional`` / ``access:conditional`` values become
structured rows.

Reference semantics reimplemented from scratch (cited, not copied):

  - ``24/7`` (case-insensitive) → one unrestricted rule 00:00-23:59
    (opening_hours.rs:148-159);
  - rules split on ``;``; ANY rule failing fails the whole parse
    (rs:161-173 — errors propagate through ``?``);
  - per rule: ``closed``/``off`` (case-insensitive) → a closed rule
    (rs:180-186); otherwise whitespace-split parts are partitioned by a
    LATCHING scan — once a part looks like a time (contains ``:`` and
    len >= 3, rs:226-228) every later part is time-side (rs:195-201);
  - weekdays: the FIRST weekday part that parses wins, failures are
    silently skipped (``find_map``, rs:203-206); ``-`` → range (exactly
    2 sections), ``,`` → list (every entry must parse), else single
    (rs:230-251); day tokens match abbreviated or full names
    case-insensitively (rs:26-39);
  - times: the time parts re-join on `` `` then split on ``,``;
    ``a-b`` → range of two times, a bare time point spans one hour
    (23 wraps to 0, minute kept, rs:276-283); a time is ``H:M`` (exactly
    2 sections) or a bare hour; hour <= 24, minute <= 59 (rs:48-55) and
    the integer grammar is Rust ``u8::from_str`` (optional ``+``, digits,
    <= 255);
  - a rule with neither weekdays nor times is an error (rs:215-217).

Conditional restrictions (condition.rs:321-391 ``Condition::parse``)
layer on top: strip one ``(...)`` wrap, try AND/OR combination first
(case-insensitive, LEFT-most `` AND `` found on the raw string before
`` OR ``, each side recursively parsed), then the ordered taxonomy —
time/date (opening hours, optional trailing ``"comment"``), season,
road condition, vehicle property ``prop op value[unit]``, vehicle usage
(``hazmat`` / ``occupants op n`` / generic load), user group, purpose,
``stay op n unit`` — falling back to Raw. Operator scan order is
["<=", ">=", "<", ">", "="] (first *found*, condition.rs:457).

The engine op parses each DISTINCT value once per Arrow batch (condition
strings repeat heavily in real tag data — the maxspeed_parse recipe) and
broadcasts rows back by value; everything stays one narrow pass.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WEEKDAY_TOKENS = ["Mo", "Tu", "We", "Th", "Fr", "Sa", "Su"]
_WD_FROM = {t.lower(): t for t in WEEKDAY_TOKENS}
_WD_FROM.update({full: tok for full, tok in zip(
    ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday",
     "sunday"], WEEKDAY_TOKENS)})

_U8_RE = re.compile(r"^\+?[0-9]+$")


def _parse_u8(s: str) -> int | None:
    """Rust ``u8::from_str``: optional '+', digits only, value <= 255."""
    if not _U8_RE.match(s):
        return None
    v = int(s)
    return v if v <= 255 else None


def _weekday(s: str) -> str | None:
    """Canonical 2-letter token, or None (opening_hours.rs:26-39)."""
    return _WD_FROM.get(s.lower())


def _parse_time(s: str) -> tuple[int, int] | None:
    """(hour, minute) or None. Hour-only inputs get minute 0
    (opening_hours.rs:289-307); Time::new bounds hour<=24, minute<=59."""
    s = s.strip()
    if ":" in s:
        parts = s.split(":")
        if len(parts) != 2:
            return None
        h, m = _parse_u8(parts[0]), _parse_u8(parts[1])
    else:
        h, m = _parse_u8(s), 0
    if h is None or m is None or h > 24 or m > 59:
        return None
    return h, m


def _parse_time_ranges(s: str) -> list[tuple[int, int, int, int]] | None:
    """[(start_h, start_m, end_h, end_m)] or None on any failure
    (opening_hours.rs:253-287). A bare time point spans one hour; hour
    23 wraps to 0 with the minute kept (rs:276-283)."""
    out = []
    for part in s.split(","):
        part = part.strip()
        if "-" in part:
            ends = part.split("-")
            if len(ends) != 2:
                return None
            a = _parse_time(ends[0])
            b = _parse_time(ends[1])
            if a is None or b is None:
                return None
            out.append((*a, *b))
        else:
            a = _parse_time(part)
            if a is None:
                return None
            end_h = 0 if a[0] == 23 else a[0] + 1
            if end_h > 24:  # Time::new re-validates the derived end
                return None
            out.append((*a, end_h, a[1]))
    return out


def _parse_weekday_range(s: str) -> tuple[str, str] | None:
    """(kind, display) — kind in single|range|list — or None
    (opening_hours.rs:230-251). '-' is checked BEFORE ','."""
    if "-" in s:
        parts = s.split("-")
        if len(parts) != 2:
            return None
        a, b = _weekday(parts[0]), _weekday(parts[1])
        if a is None or b is None:
            return None
        return "range", f"{a}-{b}"
    if "," in s:
        days = [_weekday(p.strip()) for p in s.split(",")]
        if any(d is None for d in days):
            return None
        return "list", ",".join(days)
    d = _weekday(s)
    return None if d is None else ("single", d)


def _looks_like_time(s: str) -> bool:
    return ":" in s and len(s) >= 3


def _parse_rule(rule: str) -> dict | None:
    """One ``;``-separated rule → {closed, wd_kind, weekdays, times} or
    None on error (opening_hours.rs:176-224)."""
    rule = rule.strip()
    if rule.lower() in ("closed", "off"):
        return {"closed": True, "wd_kind": None, "weekdays": None,
                "times": []}
    parts = rule.split()
    if not parts:
        return None
    time_parts: list[str] = []
    weekday_parts: list[str] = []
    parsing_times = False
    for p in parts:  # latching scan (rs:195-201)
        parsing_times |= _looks_like_time(p)
        (time_parts if parsing_times else weekday_parts).append(p)
    wd = next((r for r in map(_parse_weekday_range, weekday_parts)
               if r is not None), None)
    if time_parts:
        times = _parse_time_ranges(" ".join(time_parts))
        if times is None:
            return None
    else:
        times = []
    if wd is None and not times:
        return None
    return {"closed": False, "wd_kind": wd[0] if wd else None,
            "weekdays": wd[1] if wd else None, "times": times}


def parse_opening_hours(s: str) -> list[dict] | None:
    """Full parse → flattened rows (one per rule × time range; a rule
    with no times contributes one row with tr = -1), or None when the
    whole string fails (any rule failing fails the parse,
    opening_hours.rs:144-174)."""
    if s is None:
        return None
    s = s.strip()
    if s.lower() == "24/7":
        return [{"rule": 0, "closed": False, "wd_kind": None,
                 "weekdays": None, "tr": 0, "start_h": 0, "start_m": 0,
                 "end_h": 23, "end_m": 59}]
    rows = []
    for i, part in enumerate(s.split(";")):
        r = _parse_rule(part)
        if r is None:
            return None
        base = {"rule": i, "closed": r["closed"], "wd_kind": r["wd_kind"],
                "weekdays": r["weekdays"]}
        if r["times"]:
            for j, (sh, sm, eh, em) in enumerate(r["times"]):
                rows.append(dict(base, tr=j, start_h=sh, start_m=sm,
                                 end_h=eh, end_m=em))
        else:
            rows.append(dict(base, tr=-1, start_h=None, start_m=None,
                             end_h=None, end_m=None))
    return rows


OPENING_HOURS_SCHEMA = (
    "id long, value string, ok boolean, rule int, closed boolean, "
    "wd_kind string, weekdays string, tr int, start_h int, start_m int, "
    "end_h int, end_m int")

_EMPTY_OH = pd.DataFrame(columns=[
    "id", "value", "ok", "rule", "closed", "wd_kind", "weekdays", "tr",
    "start_h", "start_m", "end_h", "end_m"])


def parse_opening_hours_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(id, value) rows → flattened opening-hours rows. Each DISTINCT
    value parses once; unparseable values yield one ok=false row (so
    every input id stays visible downstream)."""
    if not len(pdf):
        return _EMPTY_OH.copy()
    cache = {v: parse_opening_hours(v) for v in pdf["value"].unique()}
    out = []
    for rid, val in zip(pdf["id"].values, pdf["value"].values):
        rows = cache[val]
        if rows is None:
            out.append({"id": rid, "value": val, "ok": False, "rule": -1,
                        "closed": None, "wd_kind": None, "weekdays": None,
                        "tr": -1, "start_h": None, "start_m": None,
                        "end_h": None, "end_m": None})
        else:
            for r in rows:
                out.append(dict({"id": rid, "value": val, "ok": True}, **r))
    return pd.DataFrame(out)


def parse_opening_hours_tags(df: DataFrame) -> DataFrame:
    """Engine op: (id, value) → flattened rule/time-range rows in one
    Arrow pass (per-distinct-value parse inside each batch)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield parse_opening_hours_pdf(pdf)

    return df.select("id", "value").mapInPandas(
        gen, schema=OPENING_HOURS_SCHEMA)


# ----------------------------------------------------- condition.rs layer

_SEASONS = frozenset(["winter", "summer", "spring", "autumn"])
_ROAD_CONDITIONS = frozenset(["wet", "dry", "snow", "ice", "rain", "fog"])
_VEHICLE_PROPS = frozenset(["weight", "axleload", "length", "width",
                            "height", "wheels", "draught"])
_USER_GROUPS = frozenset(["doctor", "disabled", "emergency", "female",
                          "residents", "permit", "staff", "customers"])
_PURPOSES = frozenset(["destination", "delivery", "customers", "forestry",
                       "agricultural", "private", "permit"])
_OPERATORS = ["<=", ">=", "<", ">", "="]  # scan order (condition.rs:457)
_DURATION_UNITS = {"minute": "minutes", "minutes": "minutes",
                   "hour": "hours", "hours": "hours",
                   "day": "days", "days": "days"}
_F64_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _find_op(s: str) -> tuple[str, int] | None:
    for op in _OPERATORS:
        pos = s.find(op)
        if pos != -1:
            return op, pos
    return None


def _parse_value_with_unit(s: str) -> tuple[float, str | None] | None:
    """f64 with optional trailing unit (condition.rs:562-595): try the
    whole string as a number first, else the longest numeric prefix."""
    if _F64_RE.match(s):
        return float(s), None
    n = 0
    for i, c in enumerate(s):
        if c.isdigit() or c == ".":
            n = i + 1
        else:
            break
    if n == 0:
        return None
    try:
        value = float(s[:n])
    except ValueError:
        return None
    unit = s[n:].strip()
    return value, unit or None


def parse_condition(s: str) -> dict:
    """condition.rs Condition::parse — always succeeds (Raw fallback).
    Returns {cond_type, ...fields}; Combined nests left/right dicts."""
    t = s.strip()
    if t.startswith("(") and t.endswith(")"):
        t = t[1:-1]

    up = t.upper()
    and_pos = up.find(" AND ")
    if and_pos != -1:
        return {"cond_type": "combined", "op": "AND",
                "left": parse_condition(t[:and_pos]),
                "right": parse_condition(t[and_pos + 5:])}
    or_pos = up.find(" OR ")
    if or_pos != -1:
        return {"cond_type": "combined", "op": "OR",
                "left": parse_condition(t[:or_pos]),
                "right": parse_condition(t[or_pos + 4:])}

    # time/date: optional trailing "comment" (condition.rs:430-445)
    q = t.find('"')
    if q != -1:
        hours_str, comment = t[:q].strip(), t[q + 1:t.rfind('"') if
                                              t.rfind('"') > q else len(t)]
    else:
        hours_str, comment = t, None
    oh = parse_opening_hours(hours_str)
    if oh is not None:
        return {"cond_type": "time_date", "rows": oh, "comment": comment}

    low = t.lower()
    if low in _SEASONS:
        return {"cond_type": "season", "value": low}
    if low in _ROAD_CONDITIONS:
        return {"cond_type": "road", "value": low}

    hit = _find_op(t)
    if hit is not None:
        op, pos = hit
        prop = t[:pos].strip().lower()
        if prop in _VEHICLE_PROPS:
            vu = _parse_value_with_unit(t[pos + len(op):].strip())
            if vu is not None:
                return {"cond_type": "vehicle_property", "property": prop,
                        "op": op, "value": vu[0], "unit": vu[1]}

    # vehicle usage (condition.rs:484-509). Its generic-Load fallback
    # succeeds for every string except an occupants-with-operator whose
    # count fails u32 (the `?` propagates Err out), so the reference's
    # user-group / purpose / stay-duration parsers (tried after it,
    # condition.rs:369-385) are reachable ONLY on that error path —
    # where none of them can match an 'occupants…' string, landing on
    # Raw. Net effect, mirrored deliberately: 'doctor' and
    # 'stay < 2 hours' become Load, 'occupants>x' becomes Raw, and the
    # _USER_GROUPS/_PURPOSES/_DURATION_UNITS strum sets above stay as
    # documentation of the shadowed taxonomy.
    if t == "hazmat":
        return {"cond_type": "vehicle_usage", "usage": "hazmat"}
    if t.startswith("occupants"):
        hit = _find_op(t[len("occupants"):])
        if hit is not None:
            op, pos = hit
            cnt = t[len("occupants") + pos + len(op):].strip()
            if _U8_RE.match(cnt) and int(cnt) < 2 ** 32:
                return {"cond_type": "vehicle_usage", "usage": "occupants",
                        "op": op, "count": int(cnt)}
            return {"cond_type": "raw", "value": t}
    return {"cond_type": "vehicle_usage", "usage": "load", "load": t}
