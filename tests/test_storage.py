"""The commit protocol must run where the reference's data lives: on
object stores with NO atomic rename and no open-exclusive. These tests
run the maintenance ops against the S3-semantics emulation
(ObjectStoreStorage: promote = copy+delete, commit = conditional PUT)
— with os.rename forbidden outright to prove nothing python-side
depends on POSIX rename."""

from __future__ import annotations

import os

import pytest

from fupi_spark import meta
from fupi_spark.compact import compact
from fupi_spark.expire import expire_snapshots, gc_orphans
from fupi_spark.merge import merge_into
from fupi_spark.storage import LocalStorage, ObjectStoreStorage
from fupi_spark.synth import synth_clips

from .test_meta_compact import clip_multiset


def _obj_table(spark, root, n=200, parts=10):
    t = meta.create_table(spark, root, storage=ObjectStoreStorage(root))
    clips = synth_clips(spark, n, dur_range_ms=(50, 120), parts=parts)
    meta.append(t, clips, job_id="seed", parts=parts)
    return t


def test_put_if_absent_semantics(tmp_path):
    for st in (LocalStorage(str(tmp_path / "a")), ObjectStoreStorage(str(tmp_path / "b"))):
        assert st.put_if_absent("metadata/v1.json", b"first") is True
        assert st.put_if_absent("metadata/v1.json", b"second") is False
        assert st.read("metadata/v1.json") == b"first"  # loser never tears the winner
        st.put("metadata/v1.json", b"third")  # unconditional PUT replaces atomically
        assert st.read("metadata/v1.json") == b"third"


def test_full_maintenance_cycle_without_rename(spark, tmp_table_dir, monkeypatch):
    """append → compact → cluster → merge → expire on the
    no-atomic-rename storage, with os.rename raising if anything
    python-side still depends on it."""
    from pyspark.sql import functions as F

    from fupi_spark.cluster import cluster

    t = _obj_table(spark, tmp_table_dir, n=200, parts=10)
    before = clip_multiset(t.scan())

    real_rename = os.rename

    def forbidden(*a, **kw):
        raise AssertionError(f"os.rename called on object-store table: {a}")

    monkeypatch.setattr(os, "rename", forbidden)
    try:
        compact(t, target_bytes=1 << 30, job_id="c-1")
        cluster(t, curve="zorder", target_bytes=1 << 19, job_id="z-1")
        upd = (
            t.scan()
            .orderBy("clip_id")
            .limit(20)
            .withColumn("transcript", F.concat(F.col("transcript"), F.lit(" v2")))
            .cache()
        )
        upd.count()
        merge_into(t, upd, job_id="m-1")
        report = expire_snapshots(t, retain_last=1)
    finally:
        monkeypatch.setattr(os, "rename", real_rename)

    # retain_last=1 keeps the head merge; the cluster snapshot is
    # additionally pinned by the last-cluster marker (expire.py) so
    # cluster_incremental keeps its O(churn) cadence
    assert [s["operation"] for s in t.lineage_chain()] == ["cluster", "merge"]
    rows = t.scan()
    assert rows.count() == 200
    assert rows.filter(F.col("transcript").like("% v2")).count() == 20
    assert report["deleted_files"]
    # multiset equality modulo the 20 updated transcripts
    after_ids = sorted(r.clip_id for r in rows.select("clip_id").collect())
    assert after_ids == sorted(x[0] for x in before)


def test_commit_race_on_object_store(spark, tmp_table_dir):
    """The conditional-PUT claim arbitrates concurrent committers: the
    loser rebases (disjoint inputs) or conflicts (overlapping inputs)."""
    t = _obj_table(spark, tmp_table_dir, n=60, parts=3)
    base = t.current_snapshot()
    victim = t.live_files()[0]

    # winner removes `victim`
    t.commit("merge", meta._empty_manifest(t.stats_spec), removed_paths={victim})

    # loser planned against the stale base with victim as input
    with pytest.raises(meta.CommitConflict):
        t.commit(
            "compact",
            meta._empty_manifest(t.stats_spec),
            removed_paths={victim},
            base=base,
            input_paths={victim},
        )

    # disjoint-input loser rebases and lands
    other = t.live_files()[0]
    snap = t.commit(
        "compact",
        meta._empty_manifest(t.stats_spec),
        removed_paths={other},
        base=base,
        input_paths={other},
    )
    assert snap.parent_id == base.snapshot_id + 1


def test_gc_on_object_store(spark, tmp_table_dir):
    import shutil

    t = _obj_table(spark, tmp_table_dir, n=80, parts=4)
    stray = f"{t.data_dir}/crashed-00000.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", stray)
    assert gc_orphans(t) == ["data/crashed-00000.parquet"]
    for p in t.live_files():
        assert os.path.exists(f"{t.root}/{p}")


# -- fault injection ---------------------------------------------------------


class MidGcPromoteStorage(ObjectStoreStorage):
    """Fault injector: a queued promote becomes visible immediately
    AFTER the next LIST of data/ — the worst interleaving for GC (the
    file appears between GC's listing and its delete loop)."""

    def __init__(self, root):
        super().__init__(root)
        self.pending: list[tuple[str, str]] = []

    def queue_promote(self, local_file: str, rel: str) -> None:
        self.pending.append((local_file, rel))

    def list(self, prefix: str):
        out = super().list(prefix)
        if prefix == "data" and self.pending:
            for local_file, rel in self.pending:
                super().promote(local_file, rel)
            self.pending.clear()
        return out


class StaleLineageListStorage(ObjectStoreStorage):
    """Fault injector: LIST of _lineage/ serves a snapshot frozen at
    ``freeze()`` time (eventual-consistency lag on the listing that
    carries the in-flight-job protection)."""

    def __init__(self, root):
        super().__init__(root)
        self._frozen = None

    def freeze_lineage(self):
        self._frozen = super().list("_lineage")

    def list(self, prefix: str):
        if prefix == "_lineage" and self._frozen is not None:
            return list(self._frozen)
        return super().list(prefix)


def test_promote_landing_mid_gc_survives(spark, tmp_table_dir):
    """A slow promote that lands between GC's data LIST and its delete
    loop: the file was absent from the listing, so GC cannot touch it;
    the next GC sees it WITH its lineage marker → still protected."""
    import shutil

    st = MidGcPromoteStorage(tmp_table_dir)
    t = meta.create_table(spark, tmp_table_dir, storage=st)
    clips = synth_clips(spark, 60, dur_range_ms=(50, 100), parts=3)
    meta.append(t, clips, job_id="seed", parts=3)

    t.mark_job_active("slowjob")  # marker lands BEFORE the promote (invariant)
    src = f"{t.root}/.slow-src.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", src)
    st.queue_promote(src, "data/slowjob-00000.parquet")

    assert gc_orphans(t) == []  # promote landed mid-GC, untouched
    assert os.path.exists(f"{t.root}/data/slowjob-00000.parquet")
    assert gc_orphans(t) == []  # now visible, but lineage-protected
    assert os.path.exists(f"{t.root}/data/slowjob-00000.parquet")


def test_stale_lineage_list_needs_age_gate(spark, tmp_table_dir):
    """Eventually-consistent lineage LIST: a writer that registered
    after the listing was cached loses its in-flight protection. The
    age gate (older_than_s) is what keeps its fresh files safe — and
    without it the file IS collected, which documents WHY the protocol
    requires strongly-consistent LIST (modern S3) or a nonzero age."""
    import shutil

    st = StaleLineageListStorage(tmp_table_dir)
    t = meta.create_table(spark, tmp_table_dir, storage=st)
    clips = synth_clips(spark, 60, dur_range_ms=(50, 100), parts=3)
    meta.append(t, clips, job_id="seed", parts=3)

    st.freeze_lineage()  # the lag starts here
    t.mark_job_active("lagged")  # invisible to subsequent LISTs
    promoted = f"{t.root}/data/lagged-00000.parquet"
    shutil.copy(f"{t.root}/{t.live_files()[0]}", promoted)

    # with the age gate: fresh file survives despite the stale listing
    assert gc_orphans(t, older_than_s=3600) == []
    assert os.path.exists(promoted)

    # without it: the stale listing drops the protection → collected
    assert gc_orphans(t) == ["data/lagged-00000.parquet"]
    assert not os.path.exists(promoted)


def test_s3_storage_guarded_seam(tmp_path):
    """S3Storage is importable and constructible against a stub client
    (no network); the real-bucket path is exercised only when
    FUPI_S3_BUCKET + credentials are present."""
    from fupi_spark.storage import S3Storage

    class _StubExc(Exception):
        def __init__(self):
            super().__init__()
            self.response = {"ResponseMetadata": {"HTTPStatusCode": 412}}

    class _Stub:
        class exceptions:
            ClientError = _StubExc

        def __init__(self):
            self.objects = {}

        def put_object(self, Bucket, Key, Body, **kw):
            if kw.get("IfNoneMatch") == "*" and Key in self.objects:
                raise _StubExc()
            self.objects[Key] = bytes(Body)

        def get_object(self, Bucket, Key):
            import io

            return {"Body": io.BytesIO(self.objects[Key])}

    st = S3Storage("bucket", "tables/t1", client=_Stub())
    assert st.put_if_absent("metadata/v1.json", b"first") is True
    assert st.put_if_absent("metadata/v1.json", b"second") is False
    assert st.read("metadata/v1.json") == b"first"
    assert st._key("data/x.parquet") == "tables/t1/data/x.parquet"


def _client_err(status=None, code=""):
    """Build a botocore-shaped ClientError stand-in."""

    class _E(Exception):
        def __init__(self):
            super().__init__()
            self.response = {
                "ResponseMetadata": {"HTTPStatusCode": status},
                "Error": {"Code": code},
            }

    return _E


def test_s3_error_classification(tmp_path):
    """Conditional-PUT conflicts (412 PreconditionFailed on S3 proper,
    409 ConditionalRequestConflict on some implementations) read as a
    lost claim; transient 403/500/throttle must RAISE — and exists/
    mtime must treat only a definitive 404/NoSuchKey as missing
    (ADVICE: a throttled HEAD misread as 'object missing' would let
    GC delete live objects)."""
    import pytest

    from fupi_spark.storage import S3Storage

    class _Stub:
        class exceptions:
            ClientError = Exception  # superclass of all our stand-ins

        def __init__(self):
            self.put_exc = None
            self.head_exc = None

        def put_object(self, Bucket, Key, Body, **kw):
            if self.put_exc is not None:
                raise self.put_exc()

        def head_object(self, Bucket, Key):
            if self.head_exc is not None:
                raise self.head_exc()
            import datetime

            return {
                "LastModified": datetime.datetime.now(datetime.timezone.utc),
                "ContentLength": 3,
            }

    c = _Stub()
    st = S3Storage("bucket", "p", client=c)

    # both conflict shapes → lost claim (False), no raise
    c.put_exc = _client_err(412, "PreconditionFailed")
    assert st.put_if_absent("k", b"x") is False
    c.put_exc = _client_err(409, "ConditionalRequestConflict")
    assert st.put_if_absent("k", b"x") is False
    # code-only conflict (some SDK paths omit the status)
    c.put_exc = _client_err(None, "PreconditionFailed")
    assert st.put_if_absent("k", b"x") is False
    # throttle / server error → surfaces
    c.put_exc = _client_err(503, "SlowDown")
    with pytest.raises(Exception):
        st.put_if_absent("k", b"x")

    # exists/mtime: definitive 404 → missing; transient → raises
    c.head_exc = _client_err(404, "NotFound")
    assert st.exists("k") is False
    with pytest.raises(FileNotFoundError):
        st.mtime("k")
    c.head_exc = _client_err(403, "AccessDenied")
    with pytest.raises(Exception) as ei:
        st.exists("k")
    assert not isinstance(ei.value, FileNotFoundError)
    c.head_exc = _client_err(500, "InternalError")
    with pytest.raises(Exception):
        st.mtime("k")
    c.head_exc = None
    assert st.exists("k") is True


@pytest.mark.skipif(
    not os.environ.get("FUPI_S3_BUCKET"), reason="no S3 bucket configured"
)
def test_s3_storage_real_bucket_roundtrip():
    from fupi_spark.storage import S3Storage

    st = S3Storage(os.environ["FUPI_S3_BUCKET"], "fupi-test")
    assert st.put_if_absent("metadata/v1.json", b"x")
    assert st.read("metadata/v1.json") == b"x"
    assert "metadata/v1.json" in st.list("metadata")
    st.delete("metadata/v1.json")
