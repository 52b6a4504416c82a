"""Geosearch: Meilisearch's `_geoRadius` filter and `_geoPoint` sort rule.

Meilisearch documents may carry a `_geo: {lat, lng}` field; queries can
then filter with `_geoRadius(lat, lng, meters)` and sort with
`_geoPoint(lat, lng):asc|desc` (Meilisearch docs, geosearch guide). The
engine the reference tokenizer feeds implements both over a geo index;
this module re-bases them on the sparkft attribute store:

- lat/lng live as two float columns in the hive-bucketed AttributeStore
  (written at build time like any other attribute — bucket-pruned lookup).
- `_geoRadius` = haversine over the query's candidate doc ids (vectorized
  numpy over the store lookup), feeding the same allowed-set-gated WAND
  every other filter uses. O(candidates), never O(corpus).
- `_geoPoint` sort = the `sort` ranking rule with the distance as the key
  (ascending: nearest first), doc_id tie-break.

Distances are great-circle haversine meters on a sphere of radius
R_EARTH_M; the oracle SQL uses the identical formula, so results
hash-match.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig
from .facets import AttributeStore, matching_docs

R_EARTH_M = 6371008.8  # IUGG mean Earth radius

# ---------------------------------------------------------------------------
# Geo cell grid: Meilisearch resolves _geoRadius through an R-tree over the
# documents' points; the sparkft scale path is a fixed lat/lng grid stored in
# the AttributeIndex (attr "_geo_cell", value "i:j"). A radius query
# enumerates the cells intersecting the cap's bounding box (Matuschek's
# exact spherical-cap bbox: dlat = rho, dlng = asin(sin rho / cos lat0)),
# reads only those cells' doc-id lists, and haversine-verifies — so the geo
# side of the filter is O(docs in the box), independent of the corpus and of
# the query's term footprint.
# ---------------------------------------------------------------------------

GEO_CELL_ATTR = "_geo_cell"
GEO_CELL_DEG = 5.0


def geo_cell_column(lat_col: str = "lat", lng_col: str = "lng",
                    cell_deg: float = GEO_CELL_DEG):
    """Spark expression for a row's grid cell id "i:j" with
    i = floor(lat/deg), j = floor(lng/deg) — the exact float ops the
    query-side numpy enumeration uses, so cell membership is bit-identical
    between build and serve."""
    from pyspark.sql import functions as F

    return F.concat_ws(
        ":",
        F.floor(F.col(lat_col) / F.lit(float(cell_deg))).cast("string"),
        F.floor(F.col(lng_col) / F.lit(float(cell_deg))).cast("string"),
    )


def bbox_cells(center: tuple[float, float], radius_m: float,
               cell_deg: float = GEO_CELL_DEG,
               max_cells: int = 512) -> Optional[list[str]]:
    """Grid cells intersecting the bounding box of the spherical cap
    (center, radius_m) — a SUPERSET of the cells holding in-radius points.
    Longitude wraps at the antimeridian; a cap reaching either pole spans
    the full longitude range. Returns None when the box needs more than
    max_cells cells (caller falls back to the unpruned path) or covers the
    whole sphere."""
    lat0, lng0 = float(center[0]), float(center[1])
    rho = float(radius_m) / R_EARTH_M  # angular radius, radians
    if rho >= math.pi:
        return None  # cap covers the sphere
    dlat = math.degrees(rho) + 1e-9
    lat_lo, lat_hi = lat0 - dlat, lat0 + dlat
    if lat_hi >= 90.0 or lat_lo <= -90.0:
        # cap contains a pole: every longitude is reachable
        lng_half = 180.0
        lat_lo, lat_hi = max(lat_lo, -90.0), min(lat_hi, 90.0)
    else:
        # exact max |dlng| for a cap not containing a pole
        # (sin rho < cos lat0 is guaranteed in this branch)
        lng_half = math.degrees(
            math.asin(min(1.0, math.sin(rho) / math.cos(math.radians(lat0))))
        ) + 1e-9
    i_lo = math.floor(lat_lo / cell_deg)
    i_hi = math.floor(lat_hi / cell_deg)
    j_lo = math.floor((lng0 - lng_half) / cell_deg)
    j_hi = math.floor((lng0 + lng_half) / cell_deg)
    ncols = int(round(360.0 / cell_deg))
    half = ncols // 2
    if (i_hi - i_lo + 1) * min(j_hi - j_lo + 1, ncols + 1) > max_cells:
        return None  # cheap pre-check before materializing the j set
    cols = {((j + half) % ncols) - half
            for j in range(j_lo, min(j_hi, j_lo + ncols - 1) + 1)}
    if -half in cols:
        cols.add(half)  # a doc at exactly lng=180 floors into cell +half
    cols = sorted(cols)
    if (i_hi - i_lo + 1) * len(cols) > max_cells:
        return None
    return [f"{i}:{j}" for i in range(i_lo, i_hi + 1) for j in cols]


def haversine_m(lat: np.ndarray, lng: np.ndarray,
                center_lat: float, center_lng: float) -> np.ndarray:
    """Vectorized great-circle distance (meters) from each (lat, lng) to
    the center: 2R asin(sqrt(sin^2(dphi/2) + cos phi1 cos phi2
    sin^2(dlambda/2)))."""
    lat1 = np.radians(np.asarray(lat, dtype=np.float64))
    lng1 = np.radians(np.asarray(lng, dtype=np.float64))
    lat2 = np.radians(float(center_lat))
    lng2 = np.radians(float(center_lng))
    a = (np.sin((lat2 - lat1) / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin((lng2 - lng1) / 2.0) ** 2)
    return 2.0 * R_EARTH_M * np.arcsin(np.sqrt(a))


def geo_radius_ids(reader, store: AttributeStore, query: str,
                   center: tuple[float, float], radius_m: float,
                   cfg: TokenizerConfig = DEFAULT_CONFIG,
                   lat_col: str = "lat", lng_col: str = "lng",
                   terms: Optional[list] = None,
                   attr_index=None) -> np.ndarray:
    """Sorted doc ids within radius_m of center, usable as the allowed set
    gating WAND (tombstones excluded).

    With an AttributeIndex carrying `_geo_cell` (attr_index), the candidate
    set is the docs in the cap's bounding-box CELLS — O(docs in the box),
    independent of both corpus size and the query's term footprint; the
    returned set is a radius-exact superset-intersection either way because
    haversine verifies every candidate. Without one (or when the box
    degenerates to most of the sphere), candidates are the docs matching
    >= 1 query term (O(query postings))."""
    if attr_index is not None and GEO_CELL_ATTR in attr_index.cols:
        cells = bbox_cells(center, radius_m)
        if cells is not None:
            ids = attr_index.doc_ids_multi(GEO_CELL_ATTR, cells)
            if reader.deleted and len(ids):
                ids = ids[~reader.deleted.mask(ids)]
            if len(ids) == 0:
                return ids
            d = haversine_m(store.lookup(ids, lat_col),
                            store.lookup(ids, lng_col),
                            center[0], center[1])
            return ids[d <= radius_m]
    ids = matching_docs(reader, terms if terms is not None
                        else reader.query_terms(query, cfg))
    if len(ids) == 0:
        return ids
    d = haversine_m(store.lookup(ids, lat_col), store.lookup(ids, lng_col),
                    center[0], center[1])
    return ids[d <= radius_m]


def geo_radius_topk(reader, store: AttributeStore, query: str,
                    center: tuple[float, float], radius_m: float,
                    k: int = 10,
                    cfg: TokenizerConfig = DEFAULT_CONFIG,
                    lat_col: str = "lat", lng_col: str = "lng",
                    attr_index=None) -> list[tuple[int, float]]:
    """`filter: _geoRadius(...)`: BM25 top-k restricted to documents within
    the radius. The geo set gates the WAND scoring branch exactly like an
    attribute filter (index-global BM25 stats, comparable scores); the two
    geo_radius_ids candidate strategies yield identical top-k because WAND
    scores only docs containing >= 1 term either way."""
    from .search import wand_topk_terms

    terms = reader.query_terms(query, cfg)  # tokenize once, shared
    allowed = geo_radius_ids(reader, store, query, center, radius_m,
                             cfg=cfg, lat_col=lat_col, lng_col=lng_col,
                             terms=terms, attr_index=attr_index)
    if len(allowed) == 0:
        return []
    return wand_topk_terms(reader, terms, k, allowed=set(allowed.tolist()))


def geo_sort_topk(reader, store: AttributeStore, query: str,
                  center: tuple[float, float], k: int = 10,
                  descending: bool = False,
                  cfg: TokenizerConfig = DEFAULT_CONFIG,
                  lat_col: str = "lat", lng_col: str = "lng",
                  terms: Optional[list] = None,
                  allowed=None) -> list[tuple[int, float]]:
    """`sort: _geoPoint(lat, lng):asc|desc`: docs matching >= 1 query term
    ordered by distance to the center (doc_id tie-break). Returns
    [(doc_id, distance_m)]. Pass `terms` for an expanded term set and
    `allowed` for a composed attribute filter (both as in sort_topk). One
    lexsort over the candidates, never the corpus."""
    from .facets import _mask_allowed

    if k <= 0:
        return []
    ids = _mask_allowed(
        matching_docs(reader, terms if terms is not None
                      else reader.query_terms(query, cfg)),
        allowed,
    )
    if len(ids) == 0:
        return []
    d = haversine_m(store.lookup(ids, lat_col), store.lookup(ids, lng_col),
                    center[0], center[1])
    key = -d if descending else d
    order = np.lexsort((ids, key))[:k]
    return [(int(ids[i]), float(d[i])) for i in order]


# ---------------------------------------------------------------------------
# _geoBoundingBox (Meilisearch v1.1): filter to a lat/lng rectangle.
# Meilisearch's signature is _geoBoundingBox([lat, lng], [lat, lng]) with the
# TOP-RIGHT corner first and the BOTTOM-LEFT corner second; a left longitude
# greater than the right one means the box crosses the antimeridian. Same
# two-phase plan as _geoRadius: enumerate the rectangle's grid cells against
# the _geo_cell AttributeIndex (O(docs in the box), corpus-size independent),
# then verify each candidate against the exact rectangle predicate.
# ---------------------------------------------------------------------------


def rect_cells(lat_lo: float, lat_hi: float, lng_lo: float, lng_hi: float,
               cell_deg: float = GEO_CELL_DEG,
               max_cells: int = 512) -> Optional[list[str]]:
    """Grid cells intersecting the rectangle. lng_lo > lng_hi wraps across
    the antimeridian. None when the enumeration would exceed max_cells
    (caller falls back to the term-candidate path)."""
    if lat_hi < lat_lo:
        return []
    i_lo = math.floor(lat_lo / cell_deg)
    i_hi = math.floor(lat_hi / cell_deg)
    ncols = int(round(360.0 / cell_deg))
    half = ncols // 2
    j_lo = math.floor(lng_lo / cell_deg)
    j_hi = math.floor((lng_hi + (360.0 if lng_lo > lng_hi else 0.0))
                      / cell_deg)
    if (i_hi - i_lo + 1) * min(j_hi - j_lo + 1, ncols + 1) > max_cells:
        return None
    cols = {((j + half) % ncols) - half
            for j in range(j_lo, min(j_hi, j_lo + ncols - 1) + 1)}
    if -half in cols:
        cols.add(half)  # a doc at exactly lng=180 floors into cell +half
    cols = sorted(cols)
    if (i_hi - i_lo + 1) * len(cols) > max_cells:
        return None
    return [f"{i}:{j}" for i in range(i_lo, i_hi + 1) for j in cols]


def _in_box_mask(lat: np.ndarray, lng: np.ndarray,
                 lat_lo: float, lat_hi: float,
                 lng_lo: float, lng_hi: float) -> np.ndarray:
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    m = (lat >= lat_lo) & (lat <= lat_hi)
    if lng_lo <= lng_hi:
        return m & (lng >= lng_lo) & (lng <= lng_hi)
    return m & ((lng >= lng_lo) | (lng <= lng_hi))  # antimeridian wrap


def geo_bounding_box_ids(reader, store: AttributeStore, query: str,
                         top_right: tuple[float, float],
                         bottom_left: tuple[float, float],
                         cfg: TokenizerConfig = DEFAULT_CONFIG,
                         lat_col: str = "lat", lng_col: str = "lng",
                         terms: Optional[list] = None,
                         attr_index=None) -> np.ndarray:
    """Sorted doc ids inside the rectangle, usable as the allowed set
    gating WAND (tombstones excluded). Cell-pruned when the index carries
    `_geo_cell`, else candidates are docs matching >= 1 query term; the
    exact rectangle predicate verifies every candidate either way."""
    lat_hi, lng_hi = float(top_right[0]), float(top_right[1])
    lat_lo, lng_lo = float(bottom_left[0]), float(bottom_left[1])
    if attr_index is not None and GEO_CELL_ATTR in attr_index.cols:
        cells = rect_cells(lat_lo, lat_hi, lng_lo, lng_hi)
        if cells is not None:
            ids = (attr_index.doc_ids_multi(GEO_CELL_ATTR, cells)
                   if cells else np.empty(0, dtype=np.int64))
            if reader.deleted and len(ids):
                ids = ids[~reader.deleted.mask(ids)]
            if len(ids) == 0:
                return ids
            keep = _in_box_mask(store.lookup(ids, lat_col),
                                store.lookup(ids, lng_col),
                                lat_lo, lat_hi, lng_lo, lng_hi)
            return ids[keep]
    ids = matching_docs(reader, terms if terms is not None
                        else reader.query_terms(query, cfg))
    if len(ids) == 0:
        return ids
    keep = _in_box_mask(store.lookup(ids, lat_col),
                        store.lookup(ids, lng_col),
                        lat_lo, lat_hi, lng_lo, lng_hi)
    return ids[keep]


def geo_bounding_box_topk(reader, store: AttributeStore, query: str,
                          top_right: tuple[float, float],
                          bottom_left: tuple[float, float],
                          k: int = 10,
                          cfg: TokenizerConfig = DEFAULT_CONFIG,
                          lat_col: str = "lat", lng_col: str = "lng",
                          attr_index=None) -> list[tuple[int, float]]:
    """`filter: _geoBoundingBox([lat,lng],[lat,lng])`: BM25 top-k
    restricted to documents inside the rectangle — the box set gates the
    shared WAND loop exactly like `_geoRadius`."""
    from .search import wand_topk_terms

    terms = reader.query_terms(query, cfg)
    allowed = geo_bounding_box_ids(reader, store, query, top_right,
                                   bottom_left, cfg=cfg, lat_col=lat_col,
                                   lng_col=lng_col, terms=terms,
                                   attr_index=attr_index)
    if len(allowed) == 0:
        return []
    return wand_topk_terms(reader, terms, k, allowed=set(allowed.tolist()))
