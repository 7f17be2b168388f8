"""Pinned constants mirroring the reference engine.

Every constant cites the reference file:line it reproduces (read-only checkout
at /root/reference). Keeping these identical is what makes matched-edge
sequences byte-equal to the reference-semantics oracle.
"""

# Earth mean radius in metres — libs/routers_geo/src/lib.rs:4
EARTH_RADIUS_M = 6_371_008.8

# MVT tile extent / version — libs/routers_geo/src/lib.rs:1-2
MVT_EXTENT = 4096
MVT_VERSION = 2

# Candidate search radius (m), default — libs/routers_transition/src/match/definition.rs:12
DEFAULT_SEARCH_DISTANCE_M = 50.0

# Emission error (m) — libs/routers_transition/src/costing/default.rs:7
DEFAULT_EMISSION_ERROR_M = 25.0

# Cost decay: cost(v) = ZETA * (1/clamp(v,1e-6,1))^BETA * PRECISION as u32
# — libs/routers_transition/src/costing/util.rs:8-37
COST_ZETA = 1.0
COST_BETA = 1.0
COST_PRECISION = 100.0
COST_CLAMP_LO = 1e-6
COST_CLAMP_HI = 1.0

# Trellis integer cost domain — libs/routers_trellis/src/trellis.rs:11-19
NO_EDGE = 0xFFFF_FFFF          # u32::MAX
INF_W = 1 << 30                # additions can never overflow u32
MAX_WEIGHT = INF_W - 1

# Bounded-Dijkstra reach threshold, centimetres —
# libs/routers_transition/src/primitives/cache.rs:230 (2 km default)
DIJKSTRA_BOUND_CM = 200_000

# Predicate cache capacity — cache.rs:19
PREDICATE_CACHE_CAPACITY = 8192

# Selective weigher fan-out — libs/routers_transition/src/weigh/selective.rs:20
SELECTIVE_FANOUT = 16

# Angular-complexity damping — libs/routers_transition/src/map_path/entity.rs:273
COST_DAMPING = 0.8
# any turn >= 112.5 deg zeroes angular complexity — map_path/entity.rs:229-297
MAX_TURN_DEG = 112.5
# heading pairs closer than 1 m are skipped — map_path/entity.rs:149-168
MIN_HEADING_DIST_M = 1.0

# Realtime defaults — libs/routers_realtime/bin/orchestrator.rs:133-140
GAP_SECONDS = 120
CONTEXT_WINDOW = 10
N_PARTITIONS = 1024  # partition.rs:43-45

# Metres per degree of latitude (equirectangular padding) —
# libs/routers_shard/src/selection.rs:16
M_PER_DEG = 111_320.0

# Road class -> weight table, copied verbatim from
# libs/routers_codec/src/osm/parsers/primitives/road_class.rs:118-146
ROAD_CLASS_WEIGHT = {
    "motorway": 1,
    "motorway_link": 2,
    "trunk": 3,
    "trunk_link": 4,
    "primary": 5,
    "primary_link": 6,
    "secondary": 7,
    "secondary_link": 8,
    "tertiary": 9,
    "tertiary_link": 10,
    "residential": 10,
    "busway": 10,
    "bus_guideway": 10,
    "unclassified": 10,
    "living_street": 50,
    "service": 50,
    "road": 50,
    "raceway": 100,
    "escape": 100,
    "track": 100,
    "pedestrian": 100,
}

# highway whitelist (road filter S3) —
# libs/routers_codec/src/osm/element/variants/mod.rs:28-47
VALID_ROADWAYS = [
    "motorway", "motorway_link", "trunk", "trunk_link", "primary",
    "primary_link", "secondary", "secondary_link", "tertiary",
    "tertiary_link", "residential", "unclassified", "living_street",
    "service", "busway", "road",
]

# Max slippy zoom — libs/routers_tiles/src/primitives/fragment.rs:54-67
MAX_ZOOM = 24
