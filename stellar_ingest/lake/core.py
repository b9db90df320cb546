"""icebox — a minimal from-scratch Iceberg-*semantics* table format.

No Iceberg/Delta/Hudi jars exist in this sandbox (SURVEY.md §0), so the
snapshot-table feature set the north rule requires (atomic multi-file
commit, snapshot ids, time travel, additive schema evolution with stable
column ids, partition/bucket file pruning — BASELINE.json:6,14) is
implemented here on plain Parquet + JSON metadata.  Single-writer by
design: the epoch-fenced CDC commit protocol (cdc/commit.py) guarantees
one writer, so atomicity reduces to one ``os.replace`` of a
version-hint file — the same trick Iceberg's HadoopCatalog uses.

Layout::

    table_root/
      metadata/
        version-hint.text            # current metadata version N (atomic swap)
        v{N}.metadata.json           # schemas + snapshot log + current ids
        snap-{id}.manifest.json      # data-file list for snapshot {id}
      data/
        snap-{id}/bucket={b}/*.parquet   # immutable data files, per commit

Scale notes (100 TB / 1000 executors): metadata stays O(files) JSON on
the driver — at 10^10 events with 256 MB files that is ~4x10^5 file
entries, well within driver memory; a production version would shard
manifests per bucket exactly like Iceberg manifest lists.  Data-file
paths are absolute-relative to table_root so the table relocates.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schema model: ordered field list with stable column ids (Iceberg rule:
# ids are never reused, so additive evolution is unambiguous)
# ---------------------------------------------------------------------------

_TYPE_TO_SPARK = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}
_SPARK_TO_TYPE = {v.typeName(): k for k, v in _TYPE_TO_SPARK.items()}


def fields_to_struct(fields: list[dict]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], _TYPE_TO_SPARK[f["type"]], f.get("nullable", True))
            for f in fields
        ]
    )


def struct_to_fields(struct: T.StructType, start_id: int = 1) -> list[dict]:
    out = []
    for i, f in enumerate(struct.fields):
        out.append(
            {
                "id": start_id + i,
                "name": f.name,
                "type": _SPARK_TO_TYPE[f.dataType.typeName()],
                "nullable": bool(f.nullable),
            }
        )
    return out


def _atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class IceboxTable:
    """Handle to one icebox table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")
        self._hint = os.path.join(self.meta_dir, "version-hint.text")

    # -- existence / creation ------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self._hint)

    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType,
        *,
        num_buckets: int = 16,
        bucket_column: str = "conv_id",
        properties: dict | None = None,
    ) -> "IceboxTable":
        t = cls(root)
        if t.exists():
            raise FileExistsError(f"table already exists at {root}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        fields = struct_to_fields(schema)
        meta = {
            "format_version": 1,
            "table_uuid": uuid.uuid4().hex,
            "location": root,
            "properties": dict(properties or {}),
            "num_buckets": num_buckets,
            "bucket_column": bucket_column,
            "schemas": [{"schema_id": 0, "fields": fields}],
            "current_schema_id": 0,
            "last_column_id": max((f["id"] for f in fields), default=0),
            "snapshots": [],
            "current_snapshot_id": None,
            "last_snapshot_id": 0,
        }
        _atomic_write_json(os.path.join(t.meta_dir, "v1.metadata.json"), meta)
        _atomic_write_json(t._hint, {"version": 1})
        return t

    # -- metadata access -----------------------------------------------------

    def _version(self) -> int:
        with open(self._hint) as fh:
            return json.load(fh)["version"]

    def metadata(self) -> dict:
        v = self._version()
        with open(os.path.join(self.meta_dir, f"v{v}.metadata.json")) as fh:
            return json.load(fh)

    @property
    def num_buckets(self) -> int:
        return self.metadata()["num_buckets"]

    def schema_fields(self, schema_id: int | None = None) -> list[dict]:
        meta = self.metadata()
        sid = meta["current_schema_id"] if schema_id is None else schema_id
        for s in meta["schemas"]:
            if s["schema_id"] == sid:
                return s["fields"]
        raise KeyError(f"no schema_id {sid}")

    def schema_struct(self, schema_id: int | None = None) -> T.StructType:
        return fields_to_struct(self.schema_fields(schema_id))

    def snapshots(self) -> list[dict]:
        return self.metadata()["snapshots"]

    def current_snapshot(self) -> dict | None:
        meta = self.metadata()
        sid = meta["current_snapshot_id"]
        if sid is None:
            return None
        return self.snapshot(sid)

    def snapshot(self, snapshot_id: int) -> dict:
        for s in self.metadata()["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"no snapshot {snapshot_id}")

    def manifest(self, snapshot_id: int) -> dict:
        p = os.path.join(self.meta_dir, f"snap-{snapshot_id}.manifest.json")
        with open(p) as fh:
            return json.load(fh)

    def files(
        self, snapshot_id: int | None = None, buckets: list[int] | None = None
    ) -> list[dict]:
        """Data-file entries ``{path, bucket, rows}`` for a snapshot,
        optionally pruned to a bucket subset (metadata-level partition
        pruning — no file IO)."""
        meta = self.metadata()
        sid = meta["current_snapshot_id"] if snapshot_id is None else snapshot_id
        if sid is None:
            return []
        entries = self.manifest(sid)["files"]
        if buckets is not None:
            bset = set(buckets)
            entries = [e for e in entries if e["bucket"] in bset]
        return entries

    def file_paths(self, snapshot_id: int | None = None, buckets=None) -> list[str]:
        return [os.path.join(self.root, e["path"]) for e in self.files(snapshot_id, buckets)]

    # -- commits ---------------------------------------------------------------

    def commit(
        self,
        *,
        added_files: list[dict],
        removed_paths: set[str] | None = None,
        summary: dict | None = None,
        new_schema_fields: list[dict] | None = None,
        operation: str = "append",
    ) -> int:
        """Atomically produce the next snapshot.

        ``added_files``: ``{path (rel to root), bucket, rows}`` entries.
        ``removed_paths``: rel paths from the current snapshot to drop
        (copy-on-write replacement).  ``new_schema_fields``: full field
        list for an evolved schema (additive; ids already assigned).
        Crash-safety: everything is written under non-current names
        first; the single ``os.replace`` of the version hint is the
        commit point.  A crash before it leaves the table at the old
        snapshot with orphan files (harmless, rewritten on retry).
        """
        meta = self.metadata()
        version = self._version()
        prev_id = meta["current_snapshot_id"]
        new_id = meta["last_snapshot_id"] + 1

        carry = []
        if prev_id is not None:
            removed = removed_paths or set()
            carry = [e for e in self.manifest(prev_id)["files"] if e["path"] not in removed]
        files = carry + list(added_files)

        schema_id = meta["current_schema_id"]
        if new_schema_fields is not None:
            schema_id = max(s["schema_id"] for s in meta["schemas"]) + 1
            meta["schemas"].append({"schema_id": schema_id, "fields": new_schema_fields})
            meta["current_schema_id"] = schema_id
            meta["last_column_id"] = max(f["id"] for f in new_schema_fields)

        snap = {
            "snapshot_id": new_id,
            "parent_snapshot_id": prev_id,
            "schema_id": schema_id,
            "operation": operation,
            "timestamp_ms": int(time.time() * 1000),
            "summary": dict(summary or {}),
            "total_files": len(files),
            "total_rows": sum(e["rows"] for e in files),
        }
        manifest = {"snapshot_id": new_id, "files": files}
        _atomic_write_json(
            os.path.join(self.meta_dir, f"snap-{new_id}.manifest.json"), manifest
        )
        meta["snapshots"].append(snap)
        meta["current_snapshot_id"] = new_id
        meta["last_snapshot_id"] = new_id
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        # commit point
        _atomic_write_json(self._hint, {"version": version + 1})
        return new_id

    def evolve_schema(self, new_fields_spark: T.StructType) -> int:
        """Additive schema evolution (metadata-only commit) — new columns
        get fresh column ids, ids are never reused (Iceberg rule).
        Idempotent: columns already present are skipped; returns the
        current schema_id."""
        meta = self.metadata()
        cur = self.schema_fields()
        have = {f["name"] for f in cur}
        next_id = meta["last_column_id"] + 1
        added = []
        for f in new_fields_spark.fields:
            if f.name in have:
                continue
            added.append(
                {
                    "id": next_id,
                    "name": f.name,
                    "type": _SPARK_TO_TYPE[f.dataType.typeName()],
                    "nullable": True,  # additive columns must be nullable (old files backfill NULL)
                }
            )
            next_id += 1
        if not added:
            return meta["current_schema_id"]
        version = self._version()
        schema_id = max(s["schema_id"] for s in meta["schemas"]) + 1
        # keep engine meta columns (leading "_") last: payload evolves,
        # meta stays the trailing block
        payload = [f for f in cur if not f["name"].startswith("_")]
        metacols = [f for f in cur if f["name"].startswith("_")]
        meta["schemas"].append(
            {"schema_id": schema_id, "fields": payload + added + metacols}
        )
        meta["current_schema_id"] = schema_id
        meta["last_column_id"] = next_id - 1
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})
        return schema_id
