"""Meilisearch `/indexes` + `/tasks` route family, library form.

An IndexRegistry holds the uid -> SearchService map the multi-index
endpoints (multi_search, swap_indexes, federation) already consume, and
adds upstream's index lifecycle + task log around it:

- createIndex / getIndex / listIndexes / updateIndex / deleteIndex
  (Meilisearch `/indexes` routes, with upstream's error classes
  index_already_exists / index_not_found and the paginated list shape).
- PATCH /settings as update_settings(uid, **fields): a NEW frozen
  IndexSettings via dataclasses.replace — the service is rebuilt around
  it, so every memoized cache keyed off settings starts clean. resetting
  a field = passing its dataclass default explicitly.
- a TASK LOG: every mutation returns (and records) an upstream-shaped
  task dict; getTask / getTasks filter by indexUid / type / status.

DIVERGENCE (documented): this engine is synchronous — a mutation
completes before its call returns, so tasks are recorded directly in
their terminal state ('succeeded', or 'failed' with upstream's error
envelope when the mutation raised) and the enqueued/processing states
are never observable; cancelTasks therefore has nothing to cancel and is
not served. Task uids are sequential per registry, like upstream's
monotonic task queue.

Scale note: the registry is control-plane only — O(#indexes) dict state
on the coordinator. Data-plane work (index builds, deletes, searches)
stays in the underlying Spark jobs / segment stores; nothing here reads
postings.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from .service import IndexSettings, SearchService
from .service import swap_indexes as _swap_services


# GET/PATCH /experimental-features flag inventory (the flags this engine
# actually gates or reports; upstream rejects unknown names, so do we).
# containsFilter gates CONTAINS / STARTS WITH in filter expressions
# (v1.11/v1.12), editDocumentsByFunction gates edit_documents (v1.10),
# network gates the v1.13 remote-federation object; metrics and logsRoute
# are inert toggles here (no prometheus/log endpoints in library form).
_EXPERIMENTAL_FLAGS = ("metrics", "logsRoute", "containsFilter",
                       "editDocumentsByFunction", "network")


class IndexRegistry:
    def __init__(self):
        self._services: dict = {}
        self._meta: dict = {}
        self._tasks: list = []
        # shared BY REFERENCE with every attached service, so a PATCH here
        # is visible to services already handed out (service._resolve_filter
        # reads containsFilter through this dict)
        self._experimental: dict = {f: False for f in _EXPERIMENTAL_FLAGS}

    # -- /experimental-features ------------------------------------------
    def experimental_features(self) -> dict:
        """GET /experimental-features."""
        return dict(self._experimental)

    def update_experimental_features(self, **flags) -> dict:
        """PATCH /experimental-features: set the named flags; unknown
        names raise (upstream's invalid request on unknown field)."""
        bad = sorted(set(flags) - set(_EXPERIMENTAL_FLAGS))
        if bad:
            raise ValueError(
                f"unknown experimental feature(s) {bad}; "
                f"expected one of {sorted(_EXPERIMENTAL_FLAGS)}")
        for k, v in flags.items():
            self._experimental[k] = bool(v)
        return dict(self._experimental)

    def _require_feature(self, flag: str, what: str) -> None:
        if not self._experimental.get(flag):
            raise ValueError(
                f"{what} requires enabling the `{flag}` experimental "
                f"feature (PATCH /experimental-features)")

    # -- task log -------------------------------------------------------
    def _record(self, task_type: str, index_uid: Optional[str],
                details: dict, error: Optional[dict] = None) -> dict:
        task = {
            "uid": len(self._tasks),
            "indexUid": index_uid,
            "status": "failed" if error else "succeeded",
            "type": task_type,
            "details": details,
            "error": error,
        }
        self._tasks.append(task)
        return task

    def get_task(self, uid: int) -> dict:
        if not 0 <= uid < len(self._tasks):
            raise ValueError(f"task {uid} not found")  # upstream 404
        return self._tasks[uid]

    def get_tasks(self, index_uid: Optional[str] = None,
                  task_type: Optional[str] = None,
                  status: Optional[str] = None,
                  limit: int = 20, from_uid: Optional[int] = None) -> dict:
        """GET /tasks: newest-first (uid DESC, upstream's order), filters
        conjunctive; `from_uid` starts the page at that uid; `next` is
        the uid to pass for the following page (None when exhausted)."""
        rows = [t for t in reversed(self._tasks)
                if (index_uid is None or t["indexUid"] == index_uid)
                and (task_type is None or t["type"] == task_type)
                and (status is None or t["status"] == status)
                and (from_uid is None or t["uid"] <= from_uid)]
        page = rows[:limit]
        nxt = rows[limit]["uid"] if len(rows) > limit else None
        return {"results": page, "limit": limit, "from": from_uid,
                "next": nxt, "total": len(rows)}

    # -- /indexes routes --------------------------------------------------
    def create_index(self, uid: str, primary_key: str = "doc_id",
                     service: Optional[SearchService] = None) -> dict:
        """POST /indexes. The engine's index data lives in a segment
        store on disk, so the service (built around that store) is
        attached here; creating without one registers the uid with no
        service (searchable after update via attach)."""
        if uid in self._services or uid in self._meta:
            err = {"code": "index_already_exists",
                   "message": f"Index `{uid}` already exists."}
            self._record("indexCreation", uid, {"primaryKey": primary_key},
                         error=err)
            raise ValueError(err["message"])
        self._meta[uid] = {"uid": uid, "primaryKey": primary_key}
        if service is not None:
            service._experimental = self._experimental
            self._services[uid] = service
        return self._record("indexCreation", uid,
                            {"primaryKey": primary_key})

    def attach(self, uid: str, service: SearchService) -> None:
        """Bind/replace the SearchService serving `uid` (the library-form
        step upstream's document-addition tasks perform implicitly)."""
        if uid not in self._meta:
            raise ValueError(f"Index `{uid}` not found.")
        service._experimental = self._experimental
        self._services[uid] = service

    def get_index(self, uid: str) -> dict:
        if uid not in self._meta:
            raise ValueError(f"Index `{uid}` not found.")  # index_not_found
        return dict(self._meta[uid])

    def list_indexes(self, offset: int = 0, limit: int = 20) -> dict:
        uids = sorted(self._meta)
        return {"results": [dict(self._meta[u])
                            for u in uids[offset:offset + limit]],
                "offset": offset, "limit": limit, "total": len(uids)}

    def update_index(self, uid: str, primary_key: str) -> dict:
        """PATCH /indexes/{uid} (primaryKey change). Upstream rejects the
        change once documents exist; here the primary key is fixed by the
        built store (doc_id), so the rename is metadata-only and allowed
        only while no service is attached — the same guard, stated in
        engine terms."""
        if uid not in self._meta:
            raise ValueError(f"Index `{uid}` not found.")
        if uid in self._services:
            err = {"code": "index_primary_key_already_exists",
                   "message": "primaryKey cannot change once the index "
                              "serves documents"}
            self._record("indexUpdate", uid, {"primaryKey": primary_key},
                         error=err)
            raise ValueError(err["message"])
        self._meta[uid]["primaryKey"] = primary_key
        return self._record("indexUpdate", uid, {"primaryKey": primary_key})

    def delete_index(self, uid: str) -> dict:
        if uid not in self._meta:
            err = {"code": "index_not_found",
                   "message": f"Index `{uid}` not found."}
            self._record("indexDeletion", uid, {}, error=err)
            raise ValueError(err["message"])
        self._meta.pop(uid)
        self._services.pop(uid, None)
        return self._record("indexDeletion", uid, {})

    def service(self, uid: str) -> SearchService:
        if uid not in self._services:
            raise ValueError(f"Index `{uid}` not found.")
        return self._services[uid]

    @property
    def services(self) -> dict:
        """The uid -> SearchService map multi_search / swap_indexes /
        federation consume."""
        return self._services

    # -- global routes ----------------------------------------------------
    def health(self) -> dict:
        """GET /health — the library form is always available."""
        return {"status": "available"}

    def version(self) -> dict:
        """GET /version: the engine's own version triplet (sparkft is the
        engine, not a Meilisearch build — commitSha/commitDate have no
        meaning here and are served as None, documented divergence)."""
        return {"pkgVersion": "sparkft-r5", "commitSha": None,
                "commitDate": None}

    def stats(self) -> dict:
        """GET /stats (global): per-index stats from each service's own
        oracle-gated stats() plus the summed databaseSize stand-in
        (numberOfDocuments total; byte sizes belong to the underlying
        store files, not the control plane)."""
        per = {uid: self._services[uid].stats()
               for uid in sorted(self._services)}
        return {"indexes": per,
                "numberOfDocuments": sum(s["numberOfDocuments"]
                                         for s in per.values())}

    # -- settings + task-wrapped mutations --------------------------------
    def update_settings(self, uid: str, **fields) -> dict:
        """PATCH /indexes/{uid}/settings: a NEW frozen IndexSettings via
        dataclasses.replace, the service rebuilt around it (fresh caches;
        the reader and stores are reused by path). Unknown fields raise —
        upstream's invalid_settings error class."""
        svc = self.service(uid)
        known = {f.name for f in dataclasses.fields(IndexSettings)}
        bad = sorted(set(fields) - known)
        if bad:
            err = {"code": "invalid_settings",
                   "message": f"unknown settings field(s) {bad}"}
            self._record("settingsUpdate", uid, {k: fields[k]
                                                 for k in sorted(fields)},
                         error=err)
            raise ValueError(err["message"])
        new_settings = dataclasses.replace(svc.settings, **fields)
        rebuilt = SearchService(
            svc.reader.dir, new_settings, cfg=svc.base_cfg,
            document_store=svc.document_store,
            embedding_store=svc.embedding_store,
            embedder_name=svc.embedder_name)
        rebuilt._experimental = self._experimental
        self._services[uid] = rebuilt
        return self._record("settingsUpdate", uid,
                            {k: fields[k] for k in sorted(fields)})

    def get_settings(self, uid: str) -> dict:
        """GET /indexes/{uid}/settings — the dataclass as a dict."""
        return dataclasses.asdict(self.service(uid).settings)

    def delete_documents(self, uid: str, ids=None, filter=None) -> dict:
        """Task-wrapped SearchService.delete_documents (documentDeletion
        task type, upstream's details shape)."""
        svc = self.service(uid)
        try:
            got = svc.delete_documents(ids=ids, filter=filter)
        except ValueError as exc:
            self._record("documentDeletion", uid,
                         {"providedIds": len(list(ids)) if ids else None,
                          "deletedDocuments": None},
                         error={"code": "invalid_document_delete",
                                "message": str(exc)})
            raise
        return self._record("documentDeletion", uid, got)

    def edit_documents(self, uid: str, spark, function,
                       filter=None) -> dict:
        """Meilisearch v1.10 `POST /indexes/{uid}/documents/edit`
        (editDocumentsByFunction): apply `function` to every live
        document matching `filter` (same filter language as search; None
        = the whole corpus) and re-index the changed ones. Upstream's
        function is a RHAI script; the library form is a Python callable
        doc_dict -> doc_dict. The doc dict carries doc_id, every stored
        attribute, and `text` when the index has a document store.
        Returning the doc unchanged (or None) skips it — only CHANGED
        docs are re-indexed, so an idempotent function re-run writes
        nothing. Changing doc_id raises (upstream forbids editing the
        primary key).

        Mechanics: one attribute-store browse for the matching live set,
        one callable pass, then ONE upsert_docs batch (generation-scoped
        tombstones + last-write-wins compaction) over the changed rows —
        the same verified lifecycle addOrReplace uses; edited texts are
        ALSO written to a gen-stamped docstore overlay next to the index
        (the caller-owned document store parquet stays untouched;
        SearchService._texts merges the overlay highest-gen-wins), so
        highlight/crop and a re-run of the function see the edited text —
        an idempotent function edits 0 docs on its second pass. The
        service is rebuilt so the next query serves the edited corpus.
        DIVERGENCE (documented): upserted shards carry no positions
        (upsert_docs' streaming contract). Returns the documentEdition
        task with editedDocuments = changed-doc count."""
        from .index_build import upsert_docs

        self._require_feature("editDocumentsByFunction",
                              "editing documents by function")
        svc = self.service(uid)
        if svc.document_store is None:
            # text is the indexed payload: re-indexing an edited doc
            # without it would silently erase the doc's postings
            raise ValueError("edit_documents needs a document_store "
                             "(doc text is re-indexed on edit)")
        browse = svc.get_documents(0, 10**18, filter=filter)
        ids = [int(d["doc_id"]) for d in browse["results"]]
        texts = svc._texts(ids)
        attr_cols = tuple(c for c in svc.attrs.columns())
        changed: list = []
        for d in browse["results"]:
            full = dict(d)
            full["text"] = texts.get(d["doc_id"])
            new = function(dict(full))
            if new is None or new == full:
                continue
            if int(new.get("doc_id", -1)) != int(d["doc_id"]):
                err = {"code": "edit_documents_by_function",
                       "message": "the function must not change doc_id "
                                  "(the primary key)"}
                self._record("documentEdition", uid,
                             {"editedDocuments": None}, error=err)
                raise ValueError(err["message"])
            changed.append(new)
        if changed:
            cols = ["doc_id", "text"] + list(attr_cols)
            rows = [tuple(c.get(col) for col in cols) for c in changed]
            df = spark.createDataFrame(rows, schema=cols)
            upsert_docs(spark, df, svc.reader.dir, cfg=svc.cfg,
                        attr_cols=attr_cols)
            self._write_docstore_overlay(svc.reader.dir, changed)
            self._services[uid] = SearchService(
                svc.reader.dir, svc.settings, cfg=svc.base_cfg,
                document_store=svc.document_store,
                embedding_store=svc.embedding_store,
                embedder_name=svc.embedder_name)
        return self._record("documentEdition", uid,
                            {"editedDocuments": len(changed)})

    @staticmethod
    def _write_docstore_overlay(index_dir: str, changed: list) -> None:
        """Edited texts as a gen-stamped delta parquet under
        `{index_dir}/docstore_overlay/` — the caller-owned document store
        parquet stays untouched; SearchService._texts merges the overlay
        on read (highest gen wins), so highlight/crop and the next
        edit_documents pass see the EDITED text. Same merge-on-read shape
        as the tombstone store: O(|edits|) write, O(page) read."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        ov = os.path.join(index_dir, "docstore_overlay")
        os.makedirs(ov, exist_ok=True)
        gens = [int(f.split("-")[1].split(".")[0])
                for f in os.listdir(ov)
                if f.startswith("gen-") and f.endswith(".parquet")]
        gen = (max(gens) + 1) if gens else 1
        ids = np.asarray([int(c["doc_id"]) for c in changed],
                         dtype=np.int64)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array([c["text"] for c in changed],
                                       pa.string()),
                      "gen": pa.array([gen] * len(changed), pa.int64())}),
            os.path.join(ov, f"gen-{gen}.parquet"))

    def network(self, self_name: str = "self",
                remotes: Optional[dict] = None) -> "Network":
        """Meilisearch v1.13 `PATCH /network` — declare this registry as
        `self` and bind named remotes (each remote is another
        IndexRegistry; its 'url' in library form). Gated behind the
        `network` experimental feature like upstream."""
        self._require_feature("network", "the /network route")
        return Network(self_name, {self_name: self,
                                   **(remotes or {})})

    def swap_indexes(self, pairs: list) -> dict:
        """POST /swap-indexes, task-wrapped (indexSwap task type)."""
        try:
            got = _swap_services(self._services, pairs)
        except ValueError as exc:
            self._record("indexSwap", None, {"swaps": pairs},
                         error={"code": "invalid_swap_indexes",
                                "message": str(exc)})
            raise
        return self._record("indexSwap", None, got)


class Network:
    """Meilisearch v1.13 network object: `self` + named remotes, each an
    IndexRegistry (the library form of a remote instance's URL). Feeds
    remote_federated_search below."""

    def __init__(self, self_name: str, registries: dict):
        if self_name not in registries:
            raise ValueError(f"self {self_name!r} missing from registries")
        self.self_name = self_name
        self.registries = dict(registries)

    def registry_for(self, remote: Optional[str]) -> IndexRegistry:
        name = self.self_name if remote is None else remote
        if name not in self.registries:
            raise ValueError(f"remote {name!r} is not declared in the "
                             f"network (known: {sorted(self.registries)})")
        return self.registries[name]


def remote_federated_search(network: Network, queries: list,
                            k: int = 10) -> dict:
    """Meilisearch v1.13 REMOTE federated search: `POST /multi-search`
    with `federation` where each query leg may carry
    `federationOptions.remote` — the leg runs on that remote's index and
    the hits merge into ONE ranked list across instances.

    Each leg is {"indexUid", "q", "federationOptions": {"weight": w,
    "remote": name}} (weight defaults 1.0, remote defaults to self).
    Merge rule is federated_topk's: weight * per-index BM25 (each index's
    own stats — the documented divergence from upstream's normalized
    ranking-score merge), score DESC then (remote, indexUid, doc_id) ASC.
    Hits carry upstream's `_federation` envelope {indexUid, remote,
    weightedRankingScore}; `remote` is omitted for self legs, like
    upstream. Unknown remotes / uids raise up front (upstream v1.13
    degrades with `remoteErrors` — this engine is a library call, so the
    whole request fails atomically; documented divergence).

    Scale shape: per-leg passes are independent O(query terms)
    bucket-pruned reads on whatever machine holds that registry; the
    merge is a k-way top-k of (leg, doc, score) triples — no shuffle, no
    cross-instance state beyond the k rows each leg returns."""
    from .search import taat_accumulate

    if k <= 0:
        return {"hits": [], "limit": k}
    scored: list = []
    for leg in queries:
        opts = leg.get("federationOptions", {}) or {}
        unknown = sorted(set(opts) - {"weight", "remote"})
        if unknown:
            raise ValueError(f"unknown federationOptions {unknown}")
        remote = opts.get("remote")
        weight = float(opts.get("weight", 1.0))
        svc = network.registry_for(remote).service(leg["indexUid"])
        reader = svc.reader
        terms = reader.query_terms(leg.get("q", ""), svc.cfg)
        postings = reader.load_postings(terms) if terms else {}
        if not postings:
            continue
        acc, _ = taat_accumulate(reader, postings)
        tag = (remote if remote is not None else network.self_name,
               leg["indexUid"], remote is None)
        scored.extend((tag, d, weight * s) for d, s in acc.items())
    scored.sort(key=lambda t: (-t[2], t[0][0], t[0][1], t[1]))
    hits = []
    for (rname, uid, is_self), d, s in scored[:k]:
        fed = {"indexUid": uid, "weightedRankingScore": float(s)}
        if not is_self:
            fed["remote"] = rname
        hits.append({"doc_id": int(d), "_federation": fed})
    return {"hits": hits, "limit": k,
            "estimatedTotalHits": len(scored)}


def _settings_from_json(d: dict) -> IndexSettings:
    """Rebuild a frozen IndexSettings from its JSON form (tuples came
    back as lists; localized_attributes rules are nested pairs)."""
    vals = dict(d)
    for f in dataclasses.fields(IndexSettings):
        v = vals.get(f.name)
        if isinstance(v, list):
            if f.name == "localized_attributes":
                vals[f.name] = tuple(
                    (tuple(pats), tuple(locs)) for pats, locs in v)
            elif f.name == "synonyms":
                pass  # dict, untouched
            else:
                vals[f.name] = tuple(v)
    return IndexSettings(**vals)


def create_dump(registry: IndexRegistry, path: str) -> dict:
    """Meilisearch `POST /dumps`, library form: persist the registry's
    CONTROL PLANE — index metadata, per-index settings + store paths,
    and the task log — as one JSON file. Index DATA (segments, attribute
    stores, document/embedding parquet) is already durable on disk and
    is referenced by path, not copied: upstream's dump re-indexes
    documents on import, this engine's stores are immutable files, so a
    dump is O(#indexes + #tasks), corpus-size independent. Returns the
    dumpCreation task."""
    import json
    import os

    # record FIRST so the dump carries its own creation task (and an
    # imported instance's log lines up with the source's)
    task = registry._record("dumpCreation", None,
                            {"dumpUid": os.path.basename(path)})
    payload = {
        "indexes": [
            {
                **registry._meta[uid],
                "settings": (dataclasses.asdict(
                    registry._services[uid].settings)
                    if uid in registry._services else None),
                "indexDir": (registry._services[uid].reader.dir
                             if uid in registry._services else None),
                "documentStore": (registry._services[uid].document_store
                                  if uid in registry._services else None),
                "embeddingStore": (registry._services[uid].embedding_store
                                   if uid in registry._services else None),
                "embedderName": (registry._services[uid].embedder_name
                                 if uid in registry._services else None),
            }
            for uid in sorted(registry._meta)
        ],
        "tasks": registry._tasks,
        "experimentalFeatures": dict(registry._experimental),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(payload, fh)
    return task


def load_dump(path: str) -> IndexRegistry:
    """Rebuild an IndexRegistry from a dump: metadata + task log restored
    verbatim, each index's SearchService reconstructed around its
    recorded store paths and settings (same composition the registry
    used originally). A missing index dir raises — the dump references
    data, it does not contain it."""
    import json

    with open(path) as fh:
        payload = json.load(fh)
    reg = IndexRegistry()
    for k, v in payload.get("experimentalFeatures", {}).items():
        if k in reg._experimental:
            reg._experimental[k] = bool(v)
    for ix in payload["indexes"]:
        reg._meta[ix["uid"]] = {"uid": ix["uid"],
                                "primaryKey": ix["primaryKey"]}
        if ix.get("indexDir"):
            svc = SearchService(
                ix["indexDir"], _settings_from_json(ix["settings"]),
                document_store=ix.get("documentStore"),
                embedding_store=ix.get("embeddingStore"),
                embedder_name=ix.get("embedderName") or "default")
            svc._experimental = reg._experimental
            reg._services[ix["uid"]] = svc
    reg._tasks = payload["tasks"]
    return reg
