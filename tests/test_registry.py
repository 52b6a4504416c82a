"""IndexRegistry: /indexes lifecycle, PATCH /settings rebuild, task log."""

import shutil

import pytest

from sparkft.corpus import generate_corpus
from sparkft.facets import write_attribute_store
from sparkft.index_build import build_index
from sparkft.registry import IndexRegistry
from sparkft.service import IndexSettings, SearchService


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("sparkft-registry").getOrCreate())
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = generate_corpus(120, seed=63)
    out = str(tmp_path_factory.mktemp("ridx"))
    df = spark.createDataFrame(corpus).repartition(2)
    build_index(spark, df, out, num_shards=1, num_buckets=4)
    from pyspark.sql import functions as F

    docs = (spark.createDataFrame(corpus)
            .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
            .withColumn("n_chars", F.length("content"))
            .withColumnRenamed("content", "text"))
    write_attribute_store(spark, docs, out, cols=("repo", "n_chars"))
    store = str(tmp_path_factory.mktemp("rstore") / "docs.parquet")
    docs.select("doc_id", "text").write.parquet(store)
    rows = docs.select("doc_id", "repo", "text").collect()
    return out, rows, store


def test_index_lifecycle_and_tasks(built):
    out, rows, _store = built
    reg = IndexRegistry()
    t0 = reg.create_index("docs", service=SearchService(out))
    assert (t0["uid"], t0["status"], t0["type"]) == (0, "succeeded",
                                                     "indexCreation")
    assert reg.get_index("docs") == {"uid": "docs", "primaryKey": "doc_id"}
    reg.create_index("empty", primary_key="pk")
    assert [i["uid"] for i in reg.list_indexes()["results"]] == \
        ["docs", "empty"]
    assert reg.list_indexes(offset=1, limit=1)["results"][0]["uid"] == \
        "empty"
    # duplicate create: failed task recorded, then raises
    with pytest.raises(ValueError, match="already exists"):
        reg.create_index("docs")
    failed = reg.get_tasks(status="failed")["results"]
    assert failed and failed[0]["error"]["code"] == "index_already_exists"
    # primaryKey update allowed only before a service is attached
    reg.update_index("empty", "other_pk")
    assert reg.get_index("empty")["primaryKey"] == "other_pk"
    with pytest.raises(ValueError, match="cannot change"):
        reg.update_index("docs", "nope")
    # deletion removes both meta and service
    reg.delete_index("empty")
    with pytest.raises(ValueError, match="not found"):
        reg.get_index("empty")
    with pytest.raises(ValueError, match="not found"):
        reg.delete_index("empty")
    # task log: newest first, filters conjunctive, pagination via next
    all_tasks = reg.get_tasks(limit=100)
    assert [t["uid"] for t in all_tasks["results"]] == \
        list(range(len(reg._tasks)))[::-1]
    page1 = reg.get_tasks(limit=2)
    page2 = reg.get_tasks(limit=2, from_uid=page1["next"])
    assert [t["uid"] for t in page1["results"] + page2["results"]] == \
        [t["uid"] for t in all_tasks["results"][:4]]
    assert reg.get_task(t0["uid"]) == t0
    with pytest.raises(ValueError, match="not found"):
        reg.get_task(10**6)


def test_update_settings_rebuilds_service(built):
    out, rows, _store = built
    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(out))
    # settings change takes effect on the NEXT search
    with pytest.raises(ValueError, match="not filterable"):
        reg.service("docs").search("merge", 5, filter=("repo", "x"))
    task = reg.update_settings("docs", filterable_attributes=("repo",),
                               sort_facet_values_by="count")
    assert task["type"] == "settingsUpdate"
    assert task["details"] == {"filterable_attributes": ("repo",),
                               "sort_facet_values_by": "count"}
    repo = rows[0]["repo"]
    res = reg.service("docs").search("merge", 5, filter=("repo", repo))
    assert all(h["doc_id"] in {int(r["doc_id"]) for r in rows
                               if r["repo"] == repo} for h in res["hits"])
    # settings equal direct-construction semantics (composition contract)
    direct = SearchService(out, IndexSettings(
        filterable_attributes=("repo",), sort_facet_values_by="count"))
    assert [h["doc_id"] for h in
            reg.service("docs").search("merge sort", 5)["hits"]] == \
        [h["doc_id"] for h in direct.search("merge sort", 5)["hits"]]
    assert reg.get_settings("docs")["sort_facet_values_by"] == "count"
    with pytest.raises(ValueError, match="unknown settings field"):
        reg.update_settings("docs", not_a_field=1)


def test_task_wrapped_mutations(built, tmp_path):
    out, rows, _store = built
    copy = str(tmp_path / "regdel")
    shutil.copytree(out, copy)
    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(
        copy, IndexSettings(filterable_attributes=("repo",))))
    repo = rows[0]["repo"]
    task = reg.delete_documents("docs", filter=f"repo = '{repo}'")
    assert task["type"] == "documentDeletion"
    assert task["details"]["deletedDocuments"] == \
        len([r for r in rows if r["repo"] == repo])
    # swap: task-wrapped, atomic validation
    reg.create_index("other", service=SearchService(out))
    sw = reg.swap_indexes([("docs", "other")])
    assert sw["type"] == "indexSwap" and sw["status"] == "succeeded"
    with pytest.raises(ValueError):
        reg.swap_indexes([("docs", "missing")])
    assert reg.get_tasks(task_type="indexSwap",
                         status="failed")["results"]


def test_remote_federated_search(built):
    """v1.13 remote federation: legs route to named remote registries,
    hits merge by weight * per-index BM25 with upstream's _federation
    envelope (remote omitted for self legs); unknown remote/uid raise."""
    from sparkft.registry import remote_federated_search
    from sparkft.search import IndexReader, wand_topk

    out, rows, _store = built
    home = IndexRegistry()
    home.create_index("docs", service=SearchService(out))
    other = IndexRegistry()
    other.create_index("mirror", service=SearchService(out))
    # feature-gated like upstream: OFF raises, PATCH enables
    with pytest.raises(ValueError, match="network.*experimental"):
        home.network("home", remotes={"eu": other})
    home.update_experimental_features(network=True)
    net = home.network("home", remotes={"eu": other})

    res = remote_federated_search(net, [
        {"indexUid": "docs", "q": "merge sort"},
        {"indexUid": "mirror", "q": "merge sort",
         "federationOptions": {"weight": 2.0, "remote": "eu"}},
    ], k=10)
    # the weighted mirror leg must dominate: manual merge parity
    reader = IndexReader(None, out)
    base = dict(wand_topk(reader, "merge sort", 10**9))
    want = sorted(
        [(("eu", "mirror"), d, 2.0 * s) for d, s in base.items()]
        + [(("home", "docs"), d, 1.0 * s) for d, s in base.items()],
        key=lambda t: (-t[2], t[0][0], t[0][1], t[1]))[:10]
    got = [((h["_federation"].get("remote", "home"),
             h["_federation"]["indexUid"]), h["doc_id"],
            h["_federation"]["weightedRankingScore"]) for h in res["hits"]]
    assert got == [(tag, d, s) for tag, d, s in want]
    # self legs omit "remote", remote legs carry it
    assert all("remote" not in h["_federation"]
               for h in res["hits"] if h["_federation"]["indexUid"] == "docs")
    assert all(h["_federation"]["remote"] == "eu"
               for h in res["hits"]
               if h["_federation"]["indexUid"] == "mirror")
    assert res["estimatedTotalHits"] == 2 * len(base)

    with pytest.raises(ValueError, match="not declared"):
        remote_federated_search(net, [
            {"indexUid": "docs", "q": "merge",
             "federationOptions": {"remote": "asia"}}])
    with pytest.raises(ValueError, match="not found"):
        remote_federated_search(net, [
            {"indexUid": "nope", "q": "merge"}])
    with pytest.raises(ValueError, match="unknown federationOptions"):
        remote_federated_search(net, [
            {"indexUid": "docs", "q": "merge",
             "federationOptions": {"boost": 2}}])
    with pytest.raises(ValueError, match="missing from registries"):
        from sparkft.registry import Network
        Network("home", {"eu": other})


def test_dump_round_trip(built, tmp_path):
    """POST /dumps library form: control-plane persisted (meta, settings,
    store paths, task log); load_dump rebuilds services that search
    identically; index data referenced, not copied."""
    from sparkft.registry import create_dump, load_dump

    out, rows, _store = built
    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(out))
    reg.update_settings("docs", filterable_attributes=("repo",),
                        typo_tolerance=True,
                        localized_attributes=((("title",), ("eng",)),))
    path = str(tmp_path / "dump.json")
    task = create_dump(reg, path)
    assert task["type"] == "dumpCreation" and task["status"] == "succeeded"

    back = load_dump(path)
    assert back.get_index("docs") == reg.get_index("docs")
    assert back.service("docs").settings == reg.service("docs").settings
    assert [h["doc_id"] for h in back.service("docs").search(
        "merge sort", 5)["hits"]] == \
        [h["doc_id"] for h in reg.service("docs").search(
            "merge sort", 5)["hits"]]
    # the task log survives (including the dumpCreation task itself)
    assert back.get_tasks(limit=100)["total"] == \
        reg.get_tasks(limit=100)["total"]
    assert back.get_task(task["uid"])["type"] == "dumpCreation"


def test_edit_documents_by_function(spark, built, tmp_path):
    """v1.10 editDocumentsByFunction: callable applied to the filtered
    live set, only CHANGED docs re-indexed (idempotent re-run edits 0),
    search serves the edited text, doc_id immutable."""
    out, rows, store = built
    copy = str(tmp_path / "editidx")
    shutil.copytree(out, copy)
    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(
        copy, IndexSettings(filterable_attributes=("repo",)),
        document_store=store))
    repo = rows[0]["repo"]
    n_repo = len([r for r in rows if r["repo"] == repo])

    def add_marker(doc):
        doc["text"] = doc["text"] + " zzedited"
        return doc

    # feature-gated like upstream: OFF raises, PATCH enables
    with pytest.raises(ValueError, match="editDocumentsByFunction"):
        reg.edit_documents("docs", spark, add_marker,
                           filter=f"repo = '{repo}'")
    reg.update_experimental_features(editDocumentsByFunction=True)
    task = reg.edit_documents("docs", spark, add_marker,
                              filter=f"repo = '{repo}'")
    assert task["type"] == "documentEdition"
    assert task["details"]["editedDocuments"] == n_repo
    # the edited docs (and only they) now match the marker token
    res = reg.service("docs").search("zzedited", 10**6)
    assert {h["doc_id"] for h in res["hits"]} == \
        {int(r["doc_id"]) for r in rows if r["repo"] == repo}
    # untouched docs still serve their original text
    other_docs = {int(r["doc_id"]) for r in rows if r["repo"] != repo}
    res2 = reg.service("docs").search("merge sort", 10**6)
    assert other_docs & {h["doc_id"] for h in res2["hits"]}

    # idempotent function second run: nothing changed, nothing re-indexed
    def ensure_marker(doc):
        if doc["text"].endswith(" zzedited"):
            return None
        doc["text"] += " zzedited"
        return doc

    t2 = reg.edit_documents("docs", spark, ensure_marker,
                            filter=f"repo = '{repo}'")
    assert t2["details"]["editedDocuments"] == 0

    # primary key is immutable
    def rekey(doc):
        doc["doc_id"] = 1
        return doc

    with pytest.raises(ValueError, match="must not change doc_id"):
        reg.edit_documents("docs", spark, rekey, filter=f"repo = '{repo}'")
    # and a doc-store-less service refuses up front
    reg2 = IndexRegistry()
    reg2.update_experimental_features(editDocumentsByFunction=True)
    reg2.create_index("bare", service=SearchService(out))
    with pytest.raises(ValueError, match="needs a document_store"):
        reg2.edit_documents("bare", spark, add_marker)


def test_global_routes(built):
    """GET /health, /version, /stats (global)."""
    out, rows, _store = built
    reg = IndexRegistry()
    reg.create_index("a", service=SearchService(out))
    reg.create_index("b", service=SearchService(out))
    assert reg.health() == {"status": "available"}
    assert reg.version()["pkgVersion"]
    st = reg.stats()
    assert set(st["indexes"]) == {"a", "b"}
    assert st["numberOfDocuments"] == 2 * len(rows)
    assert st["indexes"]["a"]["numberOfDocuments"] == len(rows)


def test_experimental_features_route(built):
    """GET/PATCH /experimental-features: defaults OFF, PATCH flips named
    flags, unknown names raise, and the containsFilter flag gates
    CONTAINS / STARTS WITH in filters served by ATTACHED services
    (standalone library services stay permissive)."""
    out, rows, _store = built
    # standalone service: permissive (library form)
    solo = SearchService(
        out, IndexSettings(filterable_attributes=("repo",)))
    solo.search("merge", 3, filter="repo CONTAINS repo")

    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(
        out, IndexSettings(filterable_attributes=("repo",))))
    feats = reg.experimental_features()
    assert feats == {"metrics": False, "logsRoute": False,
                     "containsFilter": False,
                     "editDocumentsByFunction": False, "network": False}

    svc = reg.service("docs")
    with pytest.raises(ValueError, match="containsFilter"):
        svc.search("merge", 3, filter="repo CONTAINS repo")
    with pytest.raises(ValueError, match="containsFilter"):
        svc.search("merge", 3, filter="repo STARTS WITH a")
    # ungated operators unaffected
    svc.search("merge", 3, filter="repo EXISTS")

    got = reg.update_experimental_features(containsFilter=True)
    assert got["containsFilter"] is True
    # the flag reaches the ALREADY-handed-out service (shared dict)
    svc.search("merge", 3, filter="repo CONTAINS repo")

    with pytest.raises(ValueError, match="unknown experimental"):
        reg.update_experimental_features(warpDrive=True)

    # settings rebuild keeps the shared flags
    reg.update_settings("docs", filterable_attributes=("repo", "n_chars"))
    reg.service("docs").search("merge", 3, filter="repo CONTAINS repo")
    reg.update_experimental_features(containsFilter=False)
    with pytest.raises(ValueError, match="containsFilter"):
        reg.service("docs").search("merge", 3,
                                   filter="repo CONTAINS repo")


def test_experimental_features_dump_round_trip(built, tmp_path):
    """A dump carries the experimental-features state."""
    from sparkft.registry import create_dump, load_dump

    out, rows, _store = built
    reg = IndexRegistry()
    reg.create_index("docs", service=SearchService(
        out, IndexSettings(filterable_attributes=("repo",))))
    reg.update_experimental_features(containsFilter=True, network=True)
    path = str(tmp_path / "dump.json")
    create_dump(reg, path)
    reg2 = load_dump(path)
    feats = reg2.experimental_features()
    assert feats["containsFilter"] and feats["network"]
    assert not feats["editDocumentsByFunction"]
    # restored services share the restored dict
    reg2.service("docs").search("merge", 3, filter="repo CONTAINS repo")
