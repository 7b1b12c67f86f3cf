"""Manifest-committed table format — the scalable half of the
lakehouse story.

The WAP table in ``sinks.py`` (versioned dirs + symlink pointer) is an
OVERWRITE table: every publish rewrites the full dataset, which is
right for curated snapshots but wrong for a table that grows by
appends — at 100 TB an append must add files, never copy them. This
module implements the manifest-log pattern Delta/Iceberg use, on plain
parquet + JSON:

- data files are immutable, written once under ``data/``;
- a COMMIT is a new manifest JSON listing the table's full live file
  set (previous list ± this commit's files) plus metadata (version,
  parent, schema, committed streaming batch ids);
- the only mutation is an atomic pointer update (``_latest`` written
  via rename(2)), so readers always see a complete committed file set
  — snapshot isolation on a filesystem. On an object store the
  pointer is a catalog entry / conditional PUT; everything else is
  identical.

Operations: append, overwrite, read (any retained version), history,
rollback (re-point, reversible), compaction (rewrite ONLY the small
files, swap them in one commit), and exactly-once STREAMING appends —
foreachBatch records the micro-batch id in the manifest itself, so a
replayed batch after a crash is recognized and skipped: the commit and
the idempotence ledger are the same atomic write (no separate marker
file to fall out of sync).

Manifests are O(files), not O(rows): at 100 TB with 1 GiB files a
manifest lists ~100k paths (a few MB of JSON); production formats
shard this into manifest FILES + a manifest list, which changes the
constant, not the design.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentCommitError(RuntimeError):
    """Raised when a commit's parent no longer equals the live pointer:
    another writer committed in between. Re-read ``latest()``, rebuild
    the commit against it, retry (the Delta/Iceberg optimistic retry
    loop — left to the caller because conflict RESOLUTION is
    operation-specific: an append can always rebase, an overwrite must
    decide)."""


class ManifestTable:
    """Handle on a manifest-committed table rooted at ``path``."""

    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.log_dir = os.path.join(path, "_log")
        self.pointer = os.path.join(path, "_latest")

    # -- commit plumbing ----------------------------------------------------

    @classmethod
    def create(cls, path: str, schema_ddl: str | None = None) -> "ManifestTable":
        t = cls(path)
        os.makedirs(t.data_dir, exist_ok=True)
        os.makedirs(t.log_dir, exist_ok=True)
        if not os.path.exists(t.pointer):
            t._commit(files=[], parent=None, schema_ddl=schema_ddl, batch_ids=[], stats={})
        return t

    def _latest_name(self) -> str:
        with open(self.pointer) as fh:
            return fh.read().strip()

    def _load(self, name: str) -> dict:
        with open(os.path.join(self.log_dir, name)) as fh:
            return json.load(fh)

    def latest(self) -> dict:
        return self._load(self._latest_name())

    def _commit(
        self,
        files: list[str],
        parent: str | None,
        schema_ddl: str | None,
        batch_ids: list,
        stats: dict,
    ) -> dict:
        version = 0 if parent is None else self._load(parent)["version"] + 1
        man = {
            "version": version,
            "parent": parent,
            "files": sorted(files),
            "schema_ddl": schema_ddl,
            "batch_ids": batch_ids,
            # per-file column min/max from the parquet FOOTERS (no data
            # scan) — the Delta/Iceberg data-skipping statistics; reads
            # with a range predicate prune whole files before Spark
            # ever lists them
            "stats": {f: stats[f] for f in stats if f in set(files)},
        }
        name = f"manifest-{version:06d}-{uuid.uuid4().hex[:8]}.json"
        with open(os.path.join(self.log_dir, name), "w") as fh:
            json.dump(man, fh)
        # the ONLY mutation: atomic pointer replace. A crash before this
        # line leaves an orphan manifest that is never referenced; a
        # crash after is a completed commit.
        #
        # Optimistic-concurrency check (best-effort filesystem CAS, the
        # conditional-PUT a real object store provides): the pointer
        # must still name the parent this commit was built against. Two
        # concurrent writers both pass latest() at read time; the
        # second one to reach this line now FAILS instead of silently
        # discarding the first writer's files from the live set. The
        # check-then-replace pair is not atomic on a plain filesystem —
        # a loss window of one os.replace remains — hence "best-effort";
        # the loser's manifest stays as an unreferenced orphan either
        # way (never corrupt state, only a rejected commit).
        current = self._latest_name() if os.path.exists(self.pointer) else None
        if current != parent:
            raise ConcurrentCommitError(
                f"commit built on parent={parent!r} but table has advanced "
                f"to {current!r}; re-read latest() and retry"
            )
        tmp = self.pointer + "." + uuid.uuid4().hex[:6]
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, self.pointer)
        return man

    # -- writes -------------------------------------------------------------

    def _write_files(self, df: DataFrame) -> tuple[list[str], str]:
        """Write a frame's parquet files into a fresh immutable subdir;
        return (relative file paths, schema ddl)."""
        sub = "batch-" + uuid.uuid4().hex[:12]
        out = os.path.join(self.data_dir, sub)
        df.write.mode("overwrite").parquet(out)
        rel = [
            os.path.join("data", sub, f)
            for f in os.listdir(out)
            if f.startswith("part-") and f.endswith(".parquet")
        ]
        return rel, df.schema.simpleString()

    def _footer_stats(self, rel_files: list[str]) -> dict:
        """Per-file top-level column min/max harvested from parquet
        footers (pure metadata read). Values kept when JSON-safe
        (int/float/decoded str); a column without usable stats is
        simply absent — readers treat absence as "cannot prune"."""
        import pyarrow.parquet as pq

        out: dict = {}
        for rf in rel_files:
            md = pq.ParquetFile(os.path.join(self.path, rf)).metadata
            cols: dict = {}
            for ci in range(md.num_columns):
                name = md.schema.column(ci).name
                lo = hi = None
                ok = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        try:
                            mn, mx = mn.decode(), mx.decode()
                        except UnicodeDecodeError:
                            ok = False
                            break
                    if not isinstance(mn, (int, float, str)):
                        ok = False
                        break
                    lo = mn if lo is None or mn < lo else lo
                    hi = mx if hi is None or mx > hi else hi
                if ok and lo is not None:
                    cols[name] = [lo, hi]
            out[rf] = cols
        return out

    def append(self, df: DataFrame, batch_id: int | None = None) -> dict:
        """Commit an append. ``batch_id`` makes the commit idempotent:
        if the latest manifest chain already recorded it (a replayed
        foreachBatch after a crash), the append is a no-op — the
        exactly-once upgrade with the ledger INSIDE the commit."""
        parent_name = self._latest_name()
        cur = self._load(parent_name)
        if batch_id is not None and batch_id in cur["batch_ids"]:
            return cur
        files, ddl = self._write_files(df)
        stats = dict(cur.get("stats", {}))
        stats.update(self._footer_stats(files))
        return self._commit(
            files=cur["files"] + files,
            parent=parent_name,
            schema_ddl=cur["schema_ddl"] or ddl,
            batch_ids=cur["batch_ids"] + ([batch_id] if batch_id is not None else []),
            stats=stats,
        )

    def overwrite(self, df: DataFrame) -> dict:
        parent_name = self._latest_name()
        cur = self._load(parent_name)
        files, ddl = self._write_files(df)
        return self._commit(
            files=files,
            parent=parent_name,
            schema_ddl=ddl,
            batch_ids=cur["batch_ids"],
            stats=self._footer_stats(files),
        )

    def compact(self, spark: SparkSession, small_file_bytes: int = 8 << 20) -> dict:
        """Rewrite ONLY the files smaller than the threshold into one
        consolidated batch and swap them in a single commit — large
        files are untouched (the property that makes compaction
        affordable at 100 TB: cost scales with the small-file tail,
        not the table)."""
        parent_name = self._latest_name()
        cur = self._load(parent_name)
        small = [
            f
            for f in cur["files"]
            if os.path.getsize(os.path.join(self.path, f)) < small_file_bytes
        ]
        if len(small) <= 1:
            return cur
        keep = [f for f in cur["files"] if f not in set(small)]
        df = spark.read.parquet(*[os.path.join(self.path, f) for f in small])
        files, _ = self._write_files(df.coalesce(1))
        stats = {f: v for f, v in cur.get("stats", {}).items() if f in set(keep)}
        stats.update(self._footer_stats(files))
        return self._commit(
            files=keep + files,
            parent=parent_name,
            schema_ddl=cur["schema_ddl"],
            batch_ids=cur["batch_ids"],
            stats=stats,
        )

    # -- reads --------------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: the file set is fixed by the manifest, so a
        concurrent append cannot change rows mid-query (snapshot
        isolation). ``version`` time-travels along the parent chain."""
        man = self.latest()
        while version is not None and man["version"] > version:
            if man["parent"] is None:
                raise IndexError(f"version {version} not found")
            man = self._load(man["parent"])
        if version is not None and man["version"] != version:
            raise IndexError(f"version {version} not found")
        if not man["files"]:
            if man["schema_ddl"]:
                return spark.createDataFrame([], man["schema_ddl"])
            raise ValueError("empty table with no schema recorded")
        return spark.read.parquet(*[os.path.join(self.path, f) for f in man["files"]])

    def prune_files(self, col: str, lo=None, hi=None) -> tuple[list[str], int]:
        """File-skipping: (files whose [min, max] for ``col`` overlaps
        [lo, hi], total live files). A file without stats for the
        column is kept (absence = cannot prune, never wrong results).
        This is manifest-level pruning — BEFORE Spark lists or opens
        anything; parquet row-group pruning still applies inside the
        surviving files."""
        man = self.latest()
        stats = man.get("stats", {})
        kept = [
            f
            for f in man["files"]
            if col not in stats.get(f, {}) or _overlaps(stats[f][col], lo, hi)
        ]
        return kept, len(man["files"])

    def read_where(self, spark: SparkSession, col: str, lo=None, hi=None) -> DataFrame:
        """Range-predicate read with data skipping: prune files by
        manifest stats, then apply the residual predicate to the
        survivors (the pruning is an optimization, never the filter).
        With a range-sorted layout (repartitionByRange before append —
        the zorder_file_layout story) file ranges are disjoint and the
        scan touches only the matching slice of a 100 TB table."""
        kept, _ = self.prune_files(col, lo, hi)
        if not kept:
            man = self.latest()
            empty = spark.createDataFrame([], man["schema_ddl"])
            return empty
        df = spark.read.parquet(*[os.path.join(self.path, f) for f in kept])
        c = df[col]
        if lo is not None:
            df = df.filter(c >= lo)
        if hi is not None:
            df = df.filter(df[col] <= hi)
        return df

    def history(self) -> list[dict]:
        """Commit chain, newest first (the DESCRIBE HISTORY analog)."""
        out, name = [], self._latest_name()
        while name is not None:
            man = self._load(name)
            out.append({"version": man["version"], "n_files": len(man["files"]), "manifest": name})
            name = man["parent"]
        return out

    def rollback(self, version: int) -> dict:
        """Re-point the table at an earlier commit — a NEW commit whose
        content equals the old one (Delta RESTORE), so the rollback is
        itself in the history and reversible."""
        parent_name = self._latest_name()
        cur = self._load(parent_name)
        man = cur
        while man["version"] > version:
            if man["parent"] is None:
                raise IndexError(f"version {version} not found")
            man = self._load(man["parent"])
        if man["version"] != version:
            raise IndexError(f"version {version} not found")
        return self._commit(
            files=man["files"],
            parent=parent_name,
            schema_ddl=man["schema_ddl"],
            batch_ids=cur["batch_ids"],
            stats=man.get("stats", {}),
        )


def _overlaps(span: list, lo, hi) -> bool:
    mn, mx = span
    return not (hi is not None and mn > hi) and not (lo is not None and mx < lo)


def stream_append(result: DataFrame, table: ManifestTable, checkpoint: str):
    """Exactly-once streaming appends: foreachBatch commits each
    micro-batch through ``table.append(df, batch_id=...)`` — the batch
    id rides inside the manifest, so a post-crash replay of a committed
    batch is a no-op even though foreachBatch itself is at-least-once.
    """

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        table.append(batch_df, batch_id=batch_id)

    return (
        result.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
