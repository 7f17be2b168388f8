"""Runtime accessibility evaluation (vehicle-profile gating).

Reproduces the reference's negative-filter access check
(libs/routers_codec/src/osm/mod.rs:200-231, `OsmEdgeMetadata::accessible`):
an edge is accessible unless an access tag that (a) restricts a transport
mode on the runtime mode's hierarchy chain and (b) matches the traversal
direction says otherwise; among the applicable tags the MOST SPECIFIC mode
wins (max by specificity level — Rust `max_by_key` keeps the LAST maximum,
reproduced here); `yes` allows, `private` allows iff the profile allows
private roads, anything else denies; no applicable tag → allow.

The transport-mode hierarchy is the land-vehicle core of
libs/routers_codec/src/osm/parsers/primitives/transport.rs:434-560
(`hierarchy_chain`); specificity = chain length (transport.rs:429), and
"restricted by" membership = the restricting mode appears on the runtime
mode's chain (transport.rs:547+, `hierarchy_chain_flags` containment).

Direction: our directed edge rows carry a ``fwd`` flag (bidirectional ways
become fwd/back twins, edge.rs:12-15). A tag with directionality
``forward`` applies to the fwd twin (Direction::Outgoing), ``backward`` to
the reversed twin (Direction::Incoming), ``both`` to either
(mod.rs:212-218).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# hierarchy chains — transport.rs:434-560 (land-transport core; the chain
# lists ancestors root-first, self last)
HIERARCHY: dict[str, tuple[str, ...]] = {
    "all": ("all",),
    "foot": ("all", "foot"),
    "horse": ("all", "horse"),
    "vehicle": ("all", "vehicle"),
    "bicycle": ("all", "vehicle", "bicycle"),
    "motor_vehicle": ("all", "vehicle", "motor_vehicle"),
    "motorcycle": ("all", "vehicle", "motor_vehicle", "motorcycle"),
    "moped": ("all", "vehicle", "motor_vehicle", "moped"),
    "motorcar": ("all", "vehicle", "motor_vehicle", "motorcar"),
    "goods": ("all", "vehicle", "motor_vehicle", "goods"),
    "hgv": ("all", "vehicle", "motor_vehicle", "goods", "hgv"),
    "agricultural": ("all", "vehicle", "motor_vehicle", "agricultural"),
    "psv": ("all", "vehicle", "motor_vehicle", "psv"),
    "bus": ("all", "vehicle", "motor_vehicle", "psv", "bus"),
    "taxi": ("all", "vehicle", "motor_vehicle", "taxi"),
    "emergency": ("all", "vehicle", "motor_vehicle", "emergency"),
}


def specificity(mode: str) -> int:
    """transport.rs:429 — chain length."""
    return len(HIERARCHY[mode])


def is_restricted_by(runtime_mode: str, restriction_mode: str) -> bool:
    """transport.rs `is_restricted_by`: the restriction applies when its
    mode sits anywhere on the runtime mode's hierarchy chain."""
    return restriction_mode in HIERARCHY.get(runtime_mode, ())


@dataclass(frozen=True)
class TripProfile:
    """Runtime routing conditions (OsmTripConfiguration analog,
    mod.rs:97-142 `runtime`): the transport mode the trip drives as, and
    whether private roads are allowed."""

    transport_mode: str = "motor_vehicle"
    allow_private_roads: bool = False

    def key(self) -> tuple:
        return (self.transport_mode, self.allow_private_roads)


def accessible(tags, profile: TripProfile, fwd: bool) -> bool:
    """One edge's accessibility under a profile (mod.rs:200-231).

    ``tags``: iterable of (mode, directionality, value) string triples;
    directionality in {'forward','backward','both'}; value is the OSM
    access value ('yes', 'no', 'private', 'destination', ...).
    """
    best = None  # (specificity, value); Rust max_by_key keeps LAST max
    for mode, direction, value in tags:
        if not is_restricted_by(profile.transport_mode, mode):
            continue
        if direction == "forward":
            if not fwd:
                continue
        elif direction == "backward":
            if fwd:
                continue
        elif direction != "both":
            continue  # unknown directionality matches nothing (mod.rs:217)
        spec = specificity(mode)
        if best is None or spec >= best[0]:
            best = (spec, value)
    if best is None:
        return True  # default allow (mod.rs:224-230)
    if best[1] == "yes":
        return True
    if best[1] == "private":
        return profile.allow_private_roads
    return False


def access_mask(edge_access: list, edge_fwd: np.ndarray,
                profile: TripProfile) -> np.ndarray:
    """Boolean accessibility per edge row. ``edge_access`` is a list (len =
    n_edges) of tag triples lists; None/empty → accessible (default allow
    fast path — most edges carry no tags)."""
    n = len(edge_fwd)
    mask = np.ones(n, dtype=bool)
    for i, tags in enumerate(edge_access):
        if tags:
            mask[i] = accessible(tags, profile, bool(edge_fwd[i]))
    return mask
