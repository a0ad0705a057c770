"""Exactly-once idempotent sink with per-partition lineage.

The reference achieves at-least-once delivery with HTTP retry x10
(HttpHealthcareApiClient.java:678-694); exactly-once is delegated to FHIR
server idempotency. This engine owns it instead: a batchId-keyed commit
protocol over a parquet table layout (the Iceberg-snapshot pattern,
self-contained so tests run without an Iceberg catalog; on a cluster the
same ``foreachBatch`` body would be a single Iceberg MERGE/append which
carries the batchId in snapshot properties).

Protocol per micro-batch:
1. if ``_commits/<batchId>.json`` exists -> **skip** (replay after restart);
2. write batch data to ``data/batch=<batchId>/`` (overwrite: a partial
   write from a crashed attempt is harmlessly clobbered);
3. write per-partition lineage + row count into the commit file, atomically
   (tmp + rename) and LAST — readers only trust committed batches.

``read_committed`` reconstructs the table from committed batches only, so a
crash between (2) and (3) loses nothing and duplicates nothing: the rerun
batch rewrites the same directory and then commits.

Filesystems: ``base_dir`` may be a plain local path OR any URI the
cluster's Hadoop configuration speaks (``hdfs://``, ``s3a://``, ``gs://``,
``dbfs:/...`` via its Hadoop adapter). All listing/commit I/O goes through
a small FS facade — local ``os`` calls for POSIX paths, the Hadoop
FileSystem API (driver-side, via the session JVM) otherwise, with parquet
row counts read from footers in both cases (metadata-only; never a second
pass over the batch).

Commit modes (``commit_mode=``):

* ``"rename"`` (default) — tmp + rename marker. Atomic on POSIX and HDFS;
  object stores only EMULATE rename (copy+delete), where a lying rename
  can leave a torn or missing marker.
* ``"put"`` — object-store-safe: the marker is written as ONE direct
  object write (a single PUT is all-or-nothing on S3/GCS — readers never
  see a partial object) and then READ BACK and byte-compared; a mismatch
  raises, so the checkpoint does not advance and the batch replays.

Both modes are torn-marker-proof on the READ side: ``is_committed`` /
``committed_batches`` accept a marker only if it parses as JSON with the
matching batch_id — a torn marker counts as uncommitted, the replay
overwrites the data directory, and the marker is rewritten (self-healing,
no loss, no duplication).
"""

from __future__ import annotations

import json
import os
import re
import time
from urllib.parse import urlparse

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

_PART_RE = re.compile(r"part-(\d+)-")


def _partition_id(fname: str, default: int) -> int:
    """Parse the task partition id from Spark's part-file name, defensively:
    an unexpected naming scheme falls back to the enumeration index instead
    of raising mid-commit."""
    m = _PART_RE.match(fname)
    return int(m.group(1)) if m else default


class _LocalFs:
    """POSIX path operations (the fast path for tests and local runs)."""

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def list_files(self, path: str) -> list[tuple[str, int]]:
        """(name, byte size) pairs — one directory scan."""
        return sorted(
            (f, os.path.getsize(os.path.join(path, f)))
            for f in os.listdir(path)
        )

    def read_text(self, path: str) -> str:
        with open(path, encoding="utf-8") as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())  # marker must survive power loss: the
            # checkpoint advances after we return, so a lost marker means
            # a batch that never replays and silently disappears
        os.replace(tmp, path)  # atomic: the commit point
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)  # persist the rename itself
        finally:
            os.close(dfd)

    def write_text_put(self, path: str, text: str) -> None:
        """Direct single-object write (the object-store-safe mode): no tmp,
        no rename. fsync'd, then read back and byte-compared — a torn or
        lost write raises, failing the batch so it replays."""
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        if self.read_text(path) != text:
            raise IOError(f"commit marker verify failed: {path}")

    def delete(self, path: str) -> None:
        import shutil

        # strict like _HadoopFs.delete: a swallowed failure here would
        # silently leak staged batch copies (the exact no-op failure mode
        # FanOutSink documents); only a missing path is fine
        if os.path.exists(path):
            shutil.rmtree(path)

    def parquet_rows(self, path: str) -> int:
        return pq.ParquetFile(path).metadata.num_rows


class _HadoopFs:
    """Any-scheme operations through the Hadoop FileSystem API (driver-side
    JVM calls — metadata-only, a handful per batch)."""

    def __init__(self, spark: SparkSession, base_uri: str):
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()
        self._fs = self._path(base_uri).getFileSystem(self._conf)

    def _path(self, uri: str):
        return self._jvm.org.apache.hadoop.fs.Path(uri)

    def mkdirs(self, path: str) -> None:
        # Hadoop reports most failures by returning false, not throwing —
        # an unchecked false here would let a failed commit-marker write
        # pass silently (checkpoint advances, batch never replays)
        if not self._fs.mkdirs(self._path(path)):
            raise IOError(f"mkdirs failed: {path}")

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._path(path))

    def isdir(self, path: str) -> bool:
        p = self._path(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def listdir(self, path: str) -> list[str]:
        statuses = self._fs.listStatus(self._path(path))
        return sorted(s.getPath().getName() for s in statuses)

    def list_files(self, path: str) -> list[tuple[str, int]]:
        """(name, byte size) pairs from ONE listStatus call — the statuses
        already carry lengths, so lineage needs no per-file open/read."""
        statuses = self._fs.listStatus(self._path(path))
        return sorted((s.getPath().getName(), s.getLen()) for s in statuses)

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._path(path))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            lines = []
            line = reader.readLine()
            while line is not None:
                lines.append(line)
                line = reader.readLine()
            return "\n".join(lines)
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = self._path(path + ".tmp")
        out = self._fs.create(tmp, True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        dst = self._path(path)
        if self._fs.exists(dst) and not self._fs.delete(dst, False):
            raise IOError(f"delete of stale commit target failed: {path}")
        # atomic on HDFS; emulated on object stores. rename reports failure
        # by returning false — raising makes foreachBatch fail so the
        # checkpoint does NOT advance and the batch replays (the alternative
        # is silent data loss: read_committed would never see this batch)
        if not self._fs.rename(tmp, dst):
            raise IOError(f"atomic commit rename failed: {tmp} -> {path}")

    def write_text_put(self, path: str, text: str) -> None:
        """Direct single-object create (object-store-safe): one PUT is
        all-or-nothing on S3/GCS — visible only after a complete upload —
        and the read-back compare catches a lost or torn write, raising so
        the checkpoint does not advance and the batch replays."""
        out = self._fs.create(self._path(path), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        if self.read_text(path) != text:
            raise IOError(f"commit marker verify failed: {path}")

    def delete(self, path: str) -> None:
        p = self._path(path)
        if not self._fs.delete(p, True) and self._fs.exists(p):
            raise IOError(f"recursive delete failed: {path}")

    def parquet_rows(self, path: str) -> int:
        hif = self._jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            self._path(path), self._conf
        )
        reader = self._jvm.org.apache.parquet.hadoop.ParquetFileReader.open(hif)
        try:
            return reader.getRecordCount()
        finally:
            reader.close()


def _is_local(path: str) -> bool:
    """Scheme-less POSIX paths use os.* directly; ANY URI — including
    file:// — goes through the Hadoop FileSystem API, so the remote code
    path is exercised by ordinary local tests with file:// sinks."""
    return urlparse(path).scheme == ""


class ExactlyOnceParquetSink:
    def __init__(
        self,
        base_dir: str,
        name: str = "sink",
        num_shards: int | None = None,
        spark: SparkSession | None = None,
        commit_mode: str = "rename",
    ):
        if commit_mode not in ("rename", "put"):
            raise ValueError(
                f"commit_mode must be 'rename' or 'put', got {commit_mode!r}"
            )
        self.base_dir = base_dir
        self.name = name
        self.num_shards = num_shards  # reference's --errorLogShardNum analogue
        self.commit_mode = commit_mode
        self._spark = spark
        self._fs_cache = None
        if _is_local(self.base_dir):
            self._fs().mkdirs(self._commits_dir)

    def _fs(self):
        if self._fs_cache is None:
            if _is_local(self.base_dir):
                self._fs_cache = _LocalFs()
            else:
                spark = self._spark or SparkSession.getActiveSession()
                if spark is None:
                    raise RuntimeError(
                        f"reading {self.base_dir!r} needs a SparkSession for the "
                        "Hadoop FileSystem API; pass spark= to the sink"
                    )
                self._fs_cache = _HadoopFs(spark, self.base_dir)
        return self._fs_cache

    @property
    def _commits_dir(self) -> str:
        return os.path.join(self.base_dir, "_commits")

    def _commit_path(self, batch_id: int) -> str:
        return os.path.join(self._commits_dir, f"{batch_id}.json")

    def _parse_marker(
        self, batch_id: int, *, check_exists: bool = True, strict: bool = False
    ) -> "dict | None":
        """The single validity rule every reader shares: a marker counts
        only if its bytes read, parse as a JSON OBJECT, and carry the
        matching batch_id. A torn copy, scalar JSON like '5' (which would
        raise AttributeError on .get), or a file that vanished between
        list and read is UNCOMMITTED: the data directory is
        overwrite-idempotent, so the worst case is a safe replay.

        A TRANSIENT read failure on a file that still exists is treated
        differently per caller. The write path (``strict=False``,
        is_committed) maps it to uncommitted — worst case a safe replay.
        Reader-facing paths (``strict=True``: read_committed / lineage /
        committed_batches) retry once and then RAISE: a committed batch
        must never silently vanish from a downstream consumer's dataset
        because of one flaky FS read.

        ``check_exists=False`` skips the exists() probe for callers that
        just listed the file (one FS round trip per marker, not three)."""
        fs = self._fs()  # outside the try: config errors must still raise
        path = self._commit_path(batch_id)
        if check_exists and not fs.exists(path):
            return None
        try:
            text = fs.read_text(path)
        except Exception as exc:
            if not fs.exists(path):
                return None  # vanished between list and read: uncommitted
            if not strict:
                return None  # write path: replay is safe and self-healing
            try:
                text = fs.read_text(path)  # one retry for transient blips
            except Exception:
                raise IOError(
                    f"committed marker unreadable (batch {batch_id}): {path}"
                ) from exc
        try:
            doc = json.loads(text)
        except ValueError:
            return None  # torn / corrupt marker bytes: uncommitted
        if not isinstance(doc, dict) or doc.get("batch_id") != batch_id:
            return None
        return doc

    def is_committed(self, batch_id: int) -> bool:
        """A marker counts only if it PARSES with the matching batch_id: a
        torn marker (non-atomic rename emulation interrupted mid-copy) is
        treated as uncommitted, so the replay self-heals it — the data
        directory is overwrite-idempotent and the marker is rewritten."""
        return self._parse_marker(batch_id) is not None

    def _data_dir(self, batch_id: int) -> str:
        return os.path.join(self.base_dir, "data", f"batch={batch_id}")

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent under Structured Streaming's replay:
        the batchId is stable across restarts for the same epoch."""
        if self._spark is None:
            self._spark = df.sparkSession
        if self.is_committed(batch_id):
            return  # replayed epoch — exactly-once guard
        out = df
        if self.num_shards:
            # repartition, NOT coalesce: coalesce is a narrow dependency
            # that caps the parallelism of the ENTIRE upstream plan (scan +
            # mapping) at num_shards; repartition shuffles only the output
            # rows (error rows are few) and leaves upstream parallelism alone
            out = out.repartition(self.num_shards)
        # exact row count rides the write itself via an Observation — no
        # second pass, no per-file I/O, fully distributed (the count is
        # aggregated executor-side during the one write job)
        obs = Observation()
        out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
        fs = self._fs()
        local = _is_local(self.base_dir)
        path = self._data_dir(batch_id)
        t0 = time.time()
        out.write.mode("overwrite").parquet(path)
        total_rows = int(obs.get["rows"])
        t1 = time.time()
        # per-partition lineage from ONE directory listing (names + byte
        # sizes come from the same listStatus). Per-file row counts are
        # added from parquet footers only on the local fast path — on a
        # remote FS a footer read is an open+seek+read round trip per file,
        # which at 10k-file batches serializes the driver; bytes + the
        # observed exact total carry the same lineage information there.
        lineage = []
        data_files = [
            (fname, size)
            for fname, size in fs.list_files(path)
            if fname.endswith(".parquet") and not fname.startswith((".", "_"))
        ]
        # fallback index counts DATA files only: enumerating the raw listing
        # (with _SUCCESS / hidden entries) would shift fallback ids and let
        # them collide with parsed ones
        for i, (fname, size) in enumerate(data_files):
            part = {
                "partition_id": _partition_id(fname, i),
                "bytes": size,
                "file": fname,
            }
            if local:
                part["rows"] = fs.parquet_rows(os.path.join(path, fname))
            lineage.append(part)
        commit = {
            "batch_id": batch_id,
            "rows": total_rows,
            "schema": out.schema.json(),  # read_committed's empty-table shape
            "partitions": sorted(lineage, key=lambda p: p["partition_id"]),
            "committed_at": time.time(),
            "sink": self.name,
        }
        t2 = time.time()
        fs.mkdirs(self._commits_dir)
        marker = json.dumps(commit)
        if self.commit_mode == "put":
            fs.write_text_put(self._commit_path(batch_id), marker)
        else:
            fs.write_text_atomic(self._commit_path(batch_id), marker)
        prof = os.environ.get("SINK_PROFILE")
        if prof:  # phase breakdown for scaling diagnosis (bench-only)
            with open(prof, "a") as f:
                f.write(
                    json.dumps(
                        {
                            "batch": batch_id,
                            "rows": total_rows,
                            "write_s": round(t1 - t0, 3),
                            "lineage_s": round(t2 - t1, 3),
                            "commit_s": round(time.time() - t2, 3),
                        }
                    )
                    + "\n"
                )

    def foreach_batch(self):
        return lambda df, batch_id: self.write_batch(df, batch_id)

    def _committed_markers(self) -> "list[tuple[int, dict]]":
        """One listing + ONE read per marker (the old shape re-probed
        exists() and re-read each marker in committed_batches, lineage
        AND read_committed — 3 driver-side FS round trips per marker per
        call, minutes per micro-batch at 10k batches on an object
        store). Same validity rule as is_committed via _parse_marker."""
        fs = self._fs()
        if not fs.isdir(self._commits_dir):
            return []
        pairs = []
        for f in fs.listdir(self._commits_dir):
            if f.endswith(".json") and f[:-5].isdigit():
                b = int(f[:-5])
                doc = self._parse_marker(b, check_exists=False, strict=True)
                if doc is not None:
                    pairs.append((b, doc))
        pairs.sort(key=lambda p: p[0])
        return pairs

    def committed_batches(self) -> list[int]:
        return [b for b, _ in self._committed_markers()]

    def lineage(self) -> list[dict]:
        return [doc for _, doc in self._committed_markers()]

    def read_committed(self, spark: SparkSession) -> DataFrame:
        if self._spark is None:
            self._spark = spark
        fs = self._fs()
        markers = self._committed_markers()
        paths = [b for b, _ in markers if fs.isdir(self._data_dir(b))]
        if not paths:
            # empty table: recover the real schema from the latest commit
            # (recorded at write time) so callers can select/filter the
            # same columns they would on a populated sink
            from pyspark.sql.types import StructType

            for _, c in reversed(markers):
                if "schema" in c:
                    return spark.createDataFrame(
                        [], StructType.fromJson(json.loads(c["schema"]))
                    )
            return spark.createDataFrame([], "conv_id string")  # no history
        return spark.read.parquet(*[self._data_dir(b) for b in paths])


class FanOutSink:
    """One foreachBatch fanning out to multiple exactly-once sinks under a
    shared batchId guard — the multi-sink atomicity strategy of SURVEY §7.4
    risk 3 (ok bundles + dead-letter + metrics from a single pass).

    The batch is STAGED to parquet once and every route reads the staged
    copy: the source plan executes exactly once per batch without
    ``df.cache()`` (which at production batch sizes evicts or spills the
    executors' storage memory — the same reason the single-sink path reads
    lineage from footers instead of caching). Staging lives beside the
    sinks and is deleted after all routes commit; a replayed epoch whose
    routes are all committed skips the staging write entirely.
    """

    def __init__(
        self,
        routes: list[tuple[ExactlyOnceParquetSink, "callable"]],
        staging_dir: str,
    ):
        self.routes = routes
        self.staging_dir = staging_dir

    def foreach_batch(self):
        def fn(df: DataFrame, batch_id: int):
            # propagate the session FIRST: is_committed() may be the first
            # remote-FS access, and the foreachBatch callback thread has no
            # active session for _HadoopFs to fall back on
            for sink, _ in self.routes:
                if sink._spark is None:
                    sink._spark = df.sparkSession
            # the staging filesystem follows staging_dir's OWN scheme — a
            # sink-derived FS with a different scheme would make the
            # finally-delete a silent no-op and leak a staged batch copy
            fs = (
                _LocalFs()
                if _is_local(self.staging_dir)
                else _HadoopFs(df.sparkSession, self.staging_dir)
            )
            staged_path = os.path.join(self.staging_dir, f"batch={batch_id}")
            if all(sink.is_committed(batch_id) for sink, _ in self.routes):
                # fully-committed replay: nothing to stage — but a crash
                # BETWEEN the last route commit and the staging delete may
                # have orphaned a staged copy; clean it now (batch ids are
                # never revisited after this)
                if fs.exists(staged_path):
                    fs.delete(staged_path)
                return
            # Reuse an existing COMPLETE staged copy (previous attempt that
            # failed after staging but before all routes committed): with a
            # nondeterministic upstream (e.g. attempt_ingest's real RPCs),
            # re-executing the plan would let already-committed sinks and
            # retried sinks disagree. One execution's results must feed
            # every sink across retries; _SUCCESS marks completeness.
            if not fs.exists(os.path.join(staged_path, "_SUCCESS")):
                df.write.mode("overwrite").parquet(staged_path)
            staged = df.sparkSession.read.parquet(staged_path)
            for sink, selector in self.routes:
                sink.write_batch(selector(staged), batch_id)
            # delete staging only after ALL routes committed — a partial
            # failure keeps the staged copy for the retry to reuse
            fs.delete(staged_path)

        return fn
