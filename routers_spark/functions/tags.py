"""OSM speed-limit tag parsing (the largest remaining reference surface
the earlier rounds scoped out): `maxspeed*` keys → normalized per-lane
km/h rows, Spark-shaped.

Reference semantics reimplemented from scratch (cited, not copied):

  - key grammar — every tag whose key starts with ``maxspeed`` is a
    speed-limit entry (collection.rs:59-64); the remaining ``:``-separated
    key sections each resolve independently to a transport mode and/or a
    directionality, first hit wins (restriction.rs:52-66);
  - value grammar — ``^\\s*(\\d+)(?:\\s*([^\\s(]+))?`` (speed_limit/
    mod.rs:21): a leading integer is REQUIRED (bare ``walk``/``none``
    values do not parse — limit.rs:77-89 returns None), the optional unit
    word selects the interpretation (speed.rs:49-68): ``mph`` ×1.609344,
    ``knots`` ×1.852 (both truncated to u16, zero → null), ``kph``/other/
    missing → km/h as-is, and the non-numeric kinds ``none``/``walk``/
    ``variable``/``inherited`` carry no km/h value;
  - conditions — the first ``(...)`` group is the condition expression
    (mod.rs:20); evaluation (opening hours) is runtime-side, the parser
    surfaces the raw condition string;
  - lanes — keys containing ``lanes`` split the value on ``|`` with
    Rust ``split_terminator`` semantics (ONE trailing empty element
    dropped, limit.rs:130-136); empty lane slots stay as null entries at
    their lane index.

The engine op is a single Arrow pass built from vectorized pandas string
ops (extract/split/explode); the key-grammar resolution runs once per
DISTINCT key (tag-key cardinality is tiny vs row count), never per row."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# speed_limit/mod.rs:20-21 — verbatim patterns
VALUE_PATTERN = r"^\s*(\d+)(?:\s*([^\s(]+))?"
CONDITION_PATTERN = r"\(([^)]+)\)"

# transport.rs strum strings (full set; access.py's HIERARCHY is the
# land-vehicle core used for runtime gating — recognition here must cover
# every mode a key section can name)
TRANSPORT_MODES = frozenset("""
access foot dog ski ski:nordic ski:alpine ski:telemark inline_skates horse
portage bicycle electric_bicycle mtb cargo_bike kick_scooter carriage
cycle_rickshaw hand_cart trailer caravan vehicle motor_vehicle motorcycle
moped speed_pedelec mofa small_electric_vehicle motorcar motorhome
tourist_bus coach goods hgv hgv_articulated bdouble agricultural
auto_rickshaw nev golf_cart microcar atv ohv snowmobile psv bus taxi
minibus share_taxi hov carpool car_sharing emergency hazmat hazmat:water
school_bus disabled boat water_access swimming ice_skates
""".split())

# direction.rs strum strings
DIRECTIONALITIES = frozenset(
    ["both_ways", "forward", "backward", "both", "left", "right"])

_NON_NUMERIC_KINDS = frozenset(["none", "walk", "variable", "inherited"])

MAXSPEED_SCHEMA = (
    "way_id long, key string, lane int, kmh int, kind string, "
    "condition string, transport_mode string, direction string"
)


def parse_restriction(key: str) -> tuple[str | None, str | None]:
    """(transport_mode, directionality) from a key's ``:`` sections —
    each section resolves independently via the strum sets, first hit
    wins (restriction.rs:52-66 parse_builder folds over split(':')).
    Two-token strum modes like ``ski:nordic`` are therefore UNREACHABLE
    from key parsing — a section never contains ':' — so
    ``maxspeed:ski:nordic`` yields mode 'ski', exactly as the reference
    (those tokens exist for whole-label from_str contexts only)."""
    mode = direction = None
    for s in key.split(":"):
        if mode is None and s in TRANSPORT_MODES:
            mode = s
        if direction is None and s in DIRECTIONALITIES:
            direction = s
    return mode, direction


def _kmh_from(num: pd.Series, unit: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(kmh int nullable, kind) from extracted number/unit columns."""
    unit = unit.fillna("").str.lower()
    n = pd.to_numeric(num, errors="coerce")
    # value.parse::<NonZeroU16>() — the RAW number must be in [1, 65535]
    # or the whole entry fails to parse (speed.rs:50)
    n = n.where((n >= 1) & (n <= 65535))
    kind = pd.Series(np.where(unit.isin(list(_NON_NUMERIC_KINDS)), unit,
                     np.where(unit.eq("mph"), "mph",
                     np.where(unit.eq("knots"), "knots", "kmh"))),
                     index=num.index)
    kind = kind.where(n.notna(), None)
    kmh = pd.Series(np.select(
        [kind.eq("mph"), kind.eq("knots"), kind.eq("kmh")],
        [np.floor(n * 1.609344), np.floor(n * 1.852), n],
        default=np.nan), index=num.index)
    # Rust float→int `as u16` saturates; NonZeroU16 turns 0 into no value
    # (speed.rs:28-40)
    kmh = kmh.clip(upper=65535).where(kmh > 0)
    return kmh.astype("Int64"), kind


def parse_maxspeed_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(way_id, key, value) rows → exploded per-lane speed rows. Pure
    pandas vectorized string ops; blanket entries use lane -1."""
    df = pdf[pdf["key"].str.startswith("maxspeed", na=False)].copy()
    if not len(df):
        return pd.DataFrame(columns=[
            "way_id", "key", "lane", "kmh", "kind", "condition",
            "transport_mode", "direction"])
    # key grammar runs once per DISTINCT key (tag-key cardinality is tiny
    # vs row count), then broadcasts back by map — the per-row work stays
    # vectorized pandas ops
    key_map = {k: parse_restriction(k) for k in df["key"].unique()}
    df["transport_mode"] = df["key"].map(lambda k: key_map[k][0])
    df["direction"] = df["key"].map(lambda k: key_map[k][1])
    is_lanes = df["key"].str.contains("lanes", na=False)

    # lanes: split on '|' with split_terminator semantics (drop ONE
    # trailing empty), explode carrying the lane index
    lane_df = df[is_lanes].copy()
    if len(lane_df):
        parts = lane_df["value"].str.split("|")
        # null values pass through str.split as NaN — skip them; and
        # split_terminator('') yields ZERO lanes (drop-one-trailing-empty
        # of [''] is []), which explode() surfaces as a NaN row below
        parts = parts.map(
            lambda p: p[:-1] if len(p) and p[-1] == "" else p,
            na_action="ignore")
        lane_df = lane_df.assign(_parts=parts).explode("_parts")
        lane_df["lane"] = lane_df.groupby(level=0).cumcount()
        lane_df["value"] = lane_df["_parts"]
        # rows whose _parts is NaN come only from empty/null VALUE lists
        # (real empty lane slots are '' strings) — no lane entries exist
        lane_df = lane_df[lane_df["_parts"].notna()].drop(columns="_parts")
    blanket = df[~is_lanes].copy()
    blanket["lane"] = -1
    out = pd.concat([blanket, lane_df], ignore_index=True)

    ext = out["value"].astype(str).str.extract(VALUE_PATTERN)
    kmh, kind = _kmh_from(ext[0], ext[1])
    out["kmh"] = kmh
    out["kind"] = kind
    out["condition"] = out["value"].astype(str).str.extract(
        CONDITION_PATTERN)[0]
    out["condition"] = out["condition"].where(out["kind"].notna(), None)
    # a blanket tag whose value fails VALUE_PATTERN contributes nothing
    # (limit.rs parse_tag returns None); failed LANE slots stay as null
    # entries at their position
    out = out[(out["lane"] >= 0) | out["kind"].notna()]
    return out[["way_id", "key", "lane", "kmh", "kind", "condition",
                "transport_mode", "direction"]]


def parse_maxspeed_tags(tags_df: DataFrame) -> DataFrame:
    """Engine op: (way_id, key, value) tag rows → per-lane speed rows in
    one Arrow pass."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = parse_maxspeed_pdf(pdf)
            out = out.astype({"lane": "int32"})
            yield out

    return tags_df.select("way_id", "key", "value").mapInPandas(
        gen, schema=MAXSPEED_SCHEMA)


# access_tag/access.rs:25-60 — AccessValue strum strings (snake_case)
ACCESS_VALUES = frozenset("""
yes no private permissive designated discouraged customers destination
agricultural forestry delivery military use_sidepath dismount permit
unknown variable
""".split())

ACCESS_SCHEMA = "way_id long, mode string, direction string, value string"


def parse_access_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """(way_id, key, value) rows → AccessTag rows (access.rs:94-105
    from_key_value): the key MUST resolve to a transport mode
    (parse_require_transport_mode — keys like ``building`` contribute
    nothing), the value MUST be an AccessValue strum string, and the
    directionality defaults to both-ways. Output directions use the
    engine eval's convention (graph/access.py): ``both`` == the
    reference's BothWays match-everything default."""
    val = pdf["value"].fillna("")
    keep = val.isin(list(ACCESS_VALUES)) & pdf["key"].notna()
    df = pdf[keep].copy()
    if not len(df):
        return pd.DataFrame(columns=["way_id", "mode", "direction", "value"])
    key_map = {k: parse_restriction(k) for k in df["key"].unique()}
    df["mode"] = df["key"].map(lambda k: key_map[k][0])
    df = df[df["mode"].notna()]
    # eval-direction mapping: BothWays (default or explicit) is the
    # match-everything 'both' in graph/access.py; the rust `Both` lane-axis
    # variant matches NOTHING in accessible (mod.rs:212-218 `_ => false`),
    # so it must NOT collide with 'both' — keep it distinct ('both_axis',
    # skipped by the eval like left/right)
    dir_map = {None: "both", "both_ways": "both", "both": "both_axis"}
    df["direction"] = df["key"].map(
        lambda k: dir_map.get(key_map[k][1], key_map[k][1]))
    return df[["way_id", "mode", "direction", "value"]]


def parse_access_tags(tags_df: DataFrame) -> DataFrame:
    """Engine op: raw (way_id, key, value) tag rows → AccessTag rows in
    one Arrow pass — the ingest side of the already-gated runtime
    ``accessible`` evaluation (graph/access.py consumes exactly these
    (mode, direction, value) triples)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield parse_access_pdf(pdf)

    return tags_df.select("way_id", "key", "value").mapInPandas(
        gen, schema=ACCESS_SCHEMA)
