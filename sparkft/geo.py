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

from typing import Optional

import numpy as np

from .config import DEFAULT_CONFIG, TokenizerConfig
from .facets import AttributeStore, matching_docs

R_EARTH_M = 6371008.8  # IUGG mean Earth radius


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
                   terms: Optional[list] = None) -> np.ndarray:
    """Sorted doc ids matching >= 1 query term AND within radius_m of
    center — the `_geoRadius` candidate set (tombstones excluded by
    matching_docs)."""
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
                    lat_col: str = "lat", lng_col: str = "lng"
                    ) -> list[tuple[int, float]]:
    """`filter: _geoRadius(...)`: BM25 top-k restricted to documents within
    the radius. The geo set gates the WAND scoring branch exactly like an
    attribute filter (index-global BM25 stats, comparable scores)."""
    from .search import wand_topk_terms

    terms = reader.query_terms(query, cfg)  # tokenize once, shared
    allowed = geo_radius_ids(reader, store, query, center, radius_m,
                             cfg=cfg, lat_col=lat_col, lng_col=lng_col,
                             terms=terms)
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
