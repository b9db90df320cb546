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
        snap-{id}.manifest-list.json # per-bucket manifest pointers (format v2)
        snap-{id}-b{b}.manifest.json # data-file list for bucket b (format v2)
        snap-{id}.manifest.json      # monolithic file list (format v1, legacy)
      data/
        snap-{id}/bucket={b}/*.parquet   # immutable data files, per commit

Manifests are sharded per bucket (format v2), exactly like Iceberg
manifest lists: a commit REWRITES only the touched buckets' manifests
and carries untouched buckets by reference (same manifest file, no
read), so commit cost and ``files(buckets=...)`` reads are O(touched),
not O(table).  Format v1 (one JSON per snapshot) remains readable and
v1 tables keep committing v1 — no migration required.

Scale notes (100 TB / 1000 executors): driver metadata per operation is
O(touched buckets' files) — at 10^10 events with 256 MB files that is
~4x10^5 entries table-wide, and a MERGE touching k of B buckets reads
k/B of them.  Data-file paths are relative to table_root so the table
relocates.
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


def type_to_spark(t: str) -> T.DataType:
    """icebox type string → Spark type; ``array<elem>`` nests (embedding
    columns and other list payloads are first-class table columns)."""
    if t.startswith("array<") and t.endswith(">"):
        return T.ArrayType(type_to_spark(t[6:-1]))
    return _TYPE_TO_SPARK[t]


def spark_to_type(dt: T.DataType) -> str:
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_to_type(dt.elementType)}>"
    return _SPARK_TO_TYPE[dt.typeName()]


def fields_to_struct(fields: list[dict]) -> T.StructType:
    return T.StructType(
        [
            T.StructField(f["name"], type_to_spark(f["type"]), f.get("nullable", True))
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
                "type": spark_to_type(f.dataType),
                "nullable": bool(f.nullable),
            }
        )
    return out


def commit_tag(path: str) -> str:
    """Commit group of a data file — the per-commit directory component
    of its (root-relative) path: ``data/<tag>/__bucket=b/...``."""
    parts = path.split("/")
    return parts[1] if len(parts) > 1 else path


def parse_ref_key(key: str) -> tuple[int, int]:
    """Manifest-list ref key → (spec_id, bucket).  Plain ``"3"`` keys
    (every pre-rescale table) are spec 0; post-rescale specs write
    ``"<spec>:<bucket>"``."""
    if ":" in key:
        s, b = key.split(":", 1)
        return int(s), int(b)
    return 0, int(key)


def ref_key(spec_id: int, bucket: int) -> str:
    return str(bucket) if spec_id == 0 else f"{spec_id}:{bucket}"


def covered_buckets(bucket: int, spec_nb: int, cur_nb: int) -> list[int]:
    """CURRENT-spec bucket ids a file written under an older spec may
    hold rows of.  Bucket assignment is ``xxhash64(key) pmod n``, and a
    rescale multiplies n by an integer factor, so a row in old bucket b
    (mod n_old) lands in exactly one of {b, b+n_old, b+2·n_old, ...}
    (mod n_cur) — the congruence class of b.  Same-spec files cover
    just their own bucket."""
    if spec_nb == cur_nb:
        return [bucket]
    return list(range(bucket, cur_nb, spec_nb))


def _atomic_write_json(path: str, obj) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, path)


class IceboxTable:
    """Handle to one icebox table rooted at ``root``.

    ``branch`` binds the handle to a named branch (write-audit-publish):
    reads resolve to the branch head and commits advance the branch
    pointer instead of main — main stays untouched until
    ``publish_branch`` fast-forwards it (the Iceberg branch-ref
    analogue).  An unborn branch forks implicitly from the current main
    head on its first commit.  ``None`` (default) is main."""

    def __init__(self, root: str, branch: str | None = None):
        self.root = root
        self.branch = branch
        self.meta_dir = os.path.join(root, "metadata")
        self.data_dir = os.path.join(root, "data")
        self._hint = os.path.join(self.meta_dir, "version-hint.text")

    def for_branch(self, branch: str | None) -> "IceboxTable":
        """A handle to the same table bound to ``branch`` (None = main)."""
        return IceboxTable(self.root, branch=branch)

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
        format_version: int = 2,
    ) -> "IceboxTable":
        t = cls(root)
        if t.exists():
            raise FileExistsError(f"table already exists at {root}")
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        fields = struct_to_fields(schema)
        meta = {
            "format_version": int(format_version),
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

    def bucket_specs(self) -> list[dict]:
        """Bucket-spec history ``[{spec_id, num_buckets}]`` (Iceberg
        partition-spec-evolution analogue).  Pre-rescale tables have the
        implicit single spec 0."""
        meta = self.metadata()
        return meta.get(
            "bucket_specs",
            [{"spec_id": 0, "num_buckets": meta["num_buckets"]}],
        )

    def current_spec_id(self) -> int:
        return self.metadata().get("current_spec_id", 0)

    def rescale_buckets(self, new_num_buckets: int) -> int:
        """Grow the bucket count (metadata-only commit; returns the new
        spec id).  ``new_num_buckets`` must be a strict integer multiple
        of the current count — that keeps every old spec's bucket a
        congruence class of the new one, so mixed-spec file pruning
        stays exact (covered_buckets) and old files migrate lazily: any
        copy-on-write touch or compaction of a descendant bucket rewrites
        the old-spec file under the current spec.  New writes use the
        new spec immediately; nothing is rewritten here.

        Requires format v2 (per-bucket manifests).  Shrinking is not
        supported — at 10^10 events the operational need is always more
        parallelism/pruning granularity, and growth keeps the congruence
        invariant one-directional."""
        meta = self.metadata()
        if int(meta.get("format_version", 1)) < 2:
            raise ValueError("bucket rescale requires format_version >= 2")
        cur = int(meta["num_buckets"])
        new = int(new_num_buckets)
        if new <= cur or new % cur != 0:
            raise ValueError(
                f"new_num_buckets must be a strict integer multiple of the "
                f"current count ({cur}), got {new}"
            )
        specs = self.bucket_specs()
        new_id = max(s["spec_id"] for s in specs) + 1
        specs = specs + [{"spec_id": new_id, "num_buckets": new}]
        version = self._version()
        meta["bucket_specs"] = specs
        meta["current_spec_id"] = new_id
        meta["num_buckets"] = new
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})
        return new_id

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

    def head_id(self, meta: dict | None = None) -> int | None:
        """The snapshot id this handle's reads/commits are based on:
        the bound branch's head when a branch is bound AND born, else
        main (``current_snapshot_id`` — also the fork point an unborn
        branch commits on top of)."""
        meta = self.metadata() if meta is None else meta
        if self.branch is not None:
            b = meta.get("branches", {}).get(self.branch)
            if b is not None:
                return b
        return meta["current_snapshot_id"]

    def current_snapshot(self) -> dict | None:
        sid = self.head_id()
        if sid is None:
            return None
        return self.snapshot(sid)

    def snapshot(self, snapshot_id: int) -> dict:
        for s in self.metadata()["snapshots"]:
            if s["snapshot_id"] == snapshot_id:
                return s
        raise KeyError(f"no snapshot {snapshot_id}")

    def snapshot_as_of(self, ts_ms: int) -> dict:
        """Newest snapshot committed at or before ``ts_ms`` (epoch
        millis) — as-of-timestamp time travel, resolved from the
        ``timestamp_ms`` every snapshot already records.  Raises
        KeyError when the table has no snapshot that old (e.g. the
        window was expired by retention)."""
        cands = [
            s for s in self.metadata()["snapshots"] if s["timestamp_ms"] <= ts_ms
        ]
        if not cands:
            raise KeyError(
                f"no snapshot at or before {ts_ms} (earliest retained may "
                "have been expired)"
            )
        return cands[-1]

    # -- named refs (tags) ---------------------------------------------------

    def refs(self) -> dict:
        """Named snapshot refs ``{tag: snapshot_id}`` (Iceberg tag
        analogue).  Tagged snapshots are retention anchors:
        ``expire_snapshots`` never drops them."""
        return dict(self.metadata().get("refs", {}))

    def tag(self, name: str, snapshot_id: int | None = None) -> int:
        """Create/move a named tag (metadata-only commit); ``None`` tags
        the current snapshot.  Returns the tagged snapshot id."""
        meta = self.metadata()
        sid = self.head_id(meta) if snapshot_id is None else snapshot_id
        if sid is None:
            raise ValueError("cannot tag an empty table (no snapshot)")
        self.snapshot(sid)  # KeyError if unknown
        version = self._version()
        meta.setdefault("refs", {})[name] = sid
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})
        return sid

    def drop_tag(self, name: str) -> None:
        meta = self.metadata()
        if name not in meta.get("refs", {}):
            raise KeyError(f"no tag {name!r}")
        version = self._version()
        del meta["refs"][name]
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})

    # -- branches (write-audit-publish) --------------------------------------

    def branches(self) -> dict:
        """Named branch heads ``{branch: snapshot_id}``.  Branch heads
        (and their ancestry within the retention window) are retention
        anchors like tags."""
        return dict(self.metadata().get("branches", {}))

    def resolve_ref(self, name: str) -> int:
        """Snapshot id for a named ref: tags first, then branch heads
        (read path for ``scan(ref=...)``)."""
        meta = self.metadata()
        if name in meta.get("refs", {}):
            return meta["refs"][name]
        if name in meta.get("branches", {}):
            return meta["branches"][name]
        raise KeyError(f"no tag or branch {name!r}")

    def is_ancestor(self, ancestor_id: int | None, descendant_id: int) -> bool:
        """True iff ``ancestor_id`` lies on ``descendant_id``'s parent
        chain (None = the empty table, ancestor of everything).  Walks
        parent ids driver-side; tolerates expired intermediate snapshots
        by following recorded parent ids only while they resolve."""
        if ancestor_id is None:
            return True
        by_id = {s["snapshot_id"]: s for s in self.metadata()["snapshots"]}
        node: int | None = descendant_id
        while node is not None:
            if node == ancestor_id:
                return True
            s = by_id.get(node)
            node = s["parent_snapshot_id"] if s else None
        return False

    def publish_branch(self, name: str) -> int:
        """Fast-forward main to the branch head and drop the branch —
        the PUBLISH step of write-audit-publish.  Atomic: one metadata
        commit (single version-hint swap), so a crash any time before
        it leaves main byte-identically untouched and the branch ready
        to re-publish.  Refuses a non-fast-forward (main moved since the
        branch forked) — that is a concurrent-writer violation of the
        single-writer protocol, not something to silently merge."""
        meta = self.metadata()
        head = meta.get("branches", {}).get(name)
        if head is None:
            raise KeyError(f"no branch {name!r}")
        main = meta["current_snapshot_id"]
        # fast-forward proof: main unmoved since the recorded fork point
        # (robust to retention expiring intermediate branch snapshots),
        # else provable ancestry on the retained parent chain
        forks = meta.get("branch_forks", {})
        unmoved = name in forks and forks[name] == main
        if not (unmoved or self.is_ancestor(main, head)):
            raise ValueError(
                f"branch {name!r} is not a fast-forward of main "
                f"(main={main}, branch head={head})"
            )
        version = self._version()
        meta["current_snapshot_id"] = head
        del meta["branches"][name]
        meta.get("branch_forks", {}).pop(name, None)
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})
        return head

    def drop_branch(self, name: str) -> None:
        """Abandon a branch (metadata-only; its snapshots age out via
        normal retention once unreferenced)."""
        meta = self.metadata()
        if name not in meta.get("branches", {}):
            raise KeyError(f"no branch {name!r}")
        version = self._version()
        del meta["branches"][name]
        meta.get("branch_forks", {}).pop(name, None)
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})

    def manifest(self, snapshot_id: int) -> dict:
        """Monolithic v1 manifest for a snapshot (legacy format only)."""
        p = os.path.join(self.meta_dir, f"snap-{snapshot_id}.manifest.json")
        with open(p) as fh:
            return json.load(fh)

    def manifest_list(self, snapshot_id: int) -> dict | None:
        """Per-bucket manifest pointers (format v2):
        ``{bucket: {manifest, files, rows}}`` keyed by str(bucket).
        Returns None for v1 snapshots."""
        p = os.path.join(self.meta_dir, f"snap-{snapshot_id}.manifest-list.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)["buckets"]

    def _read_bucket_manifest(self, fname: str) -> list[dict]:
        with open(os.path.join(self.meta_dir, fname)) as fh:
            return json.load(fh)["files"]

    def files(
        self, snapshot_id: int | None = None, buckets: list[int] | None = None
    ) -> list[dict]:
        """Data-file entries ``{path, bucket, rows[, spec_id, delta]}``
        for a snapshot, optionally pruned to a bucket subset
        (CURRENT-spec bucket ids).  On format v2 this reads ONLY the
        requested buckets' manifests — metadata IO is O(touched), the
        100-TB requirement.  After a bucket rescale, refs written under
        an older spec are included when their congruence class overlaps
        the requested buckets (covered_buckets) — pruning stays exact
        across mixed specs; callers get a SUPERSET of the requested
        buckets' rows when an old-spec file also holds sibling-bucket
        rows (scan/lookup filter rows; merge/compact migrate them)."""
        meta = self.metadata()
        sid = self.head_id(meta) if snapshot_id is None else snapshot_id
        if sid is None:
            return []
        ml = self.manifest_list(sid)
        if ml is not None:
            bset = None if buckets is None else {int(b) for b in buckets}
            spec_nb = {s["spec_id"]: s["num_buckets"] for s in self.bucket_specs()}
            cur_nb = int(meta["num_buckets"])
            out: list[dict] = []
            for key, ref in sorted(
                ml.items(), key=lambda kv: parse_ref_key(kv[0])
            ):
                s, b = parse_ref_key(key)
                if bset is not None and not any(
                    cb in bset
                    for cb in covered_buckets(b, spec_nb.get(s, cur_nb), cur_nb)
                ):
                    continue
                out += self._read_bucket_manifest(ref["manifest"])
            return out
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
        touched_buckets: list[int] | None = None,
    ) -> int:
        """Atomically produce the next snapshot.

        ``added_files``: ``{path (rel to root), bucket, rows}`` entries.
        ``removed_paths``: rel paths from the current snapshot to drop
        (copy-on-write replacement).  ``touched_buckets``: the buckets
        the removals live in (callers that pruned by bucket already know
        this); on format v2 only those buckets' manifests are read and
        rewritten — everything else carries by reference.  If omitted it
        is derived from ``added_files`` (plus, when removals exist, a
        full-bucket fallback).  ``new_schema_fields``: full field list
        for an evolved schema (additive; ids already assigned).
        Crash-safety: everything is written under non-current names
        first; the single ``os.replace`` of the version hint is the
        commit point.  A crash before it leaves the table at the old
        snapshot with orphan files (harmless, rewritten on retry).
        """
        meta = self.metadata()
        version = self._version()
        prev_id = self.head_id(meta)
        new_id = meta["last_snapshot_id"] + 1
        removed = removed_paths or set()

        if int(meta.get("format_version", 1)) >= 2:
            total_files, total_rows = self._write_manifests_v2(
                new_id, prev_id, added_files, removed, touched_buckets
            )
        else:
            carry = []
            if prev_id is not None:
                carry = [
                    e for e in self.files(prev_id) if e["path"] not in removed
                ]
            files = carry + list(added_files)
            total_files, total_rows = len(files), sum(e["rows"] for e in files)
            _atomic_write_json(
                os.path.join(self.meta_dir, f"snap-{new_id}.manifest.json"),
                {"snapshot_id": new_id, "files": files},
            )

        schema_id = meta["current_schema_id"]
        if new_schema_fields is not None:
            schema_id = max(s["schema_id"] for s in meta["schemas"]) + 1
            meta["schemas"].append({"schema_id": schema_id, "fields": new_schema_fields})
            meta["current_schema_id"] = schema_id
            meta["last_column_id"] = max(f["id"] for f in new_schema_fields)

        summary = dict(summary or {})
        # running quarantine total along the parent chain (round-5
        # ADVICE): the HEAD snapshot alone carries the write-audit
        # gate's input, so retention expiring intermediate branch
        # snapshots can no longer truncate the audit sum.  Maintenance
        # commits (fold/compact) carry the parent's lineage summary
        # forward verbatim — their copy must not be re-counted.
        prev_cum = 0
        if prev_id is not None:
            prev_snap = next(
                (s for s in meta["snapshots"] if s["snapshot_id"] == prev_id), None
            )
            if prev_snap is not None:
                prev_cum = int(
                    prev_snap.get("summary", {}).get("cum_quarantined", 0) or 0
                )
        own_q = 0
        if "maintenance" not in summary:
            own_q = int((summary.get("lineage") or {}).get("quarantined", 0) or 0)
        summary["cum_quarantined"] = prev_cum + own_q
        snap = {
            "snapshot_id": new_id,
            "parent_snapshot_id": prev_id,
            "schema_id": schema_id,
            "operation": operation,
            "timestamp_ms": int(time.time() * 1000),
            "summary": summary,
            "total_files": total_files,
            "total_rows": total_rows,
        }
        meta["snapshots"].append(snap)
        if self.branch is not None:
            # branch commit: only the branch pointer moves — main (and
            # every reader of it) cannot observe unpublished work.  The
            # first commit records the FORK POINT (main's head at birth)
            # so publish can prove fast-forward even after retention
            # expired intermediate branch snapshots.
            if self.branch not in meta.setdefault("branches", {}):
                meta.setdefault("branch_forks", {})[self.branch] = meta[
                    "current_snapshot_id"
                ]
            meta["branches"][self.branch] = new_id
        else:
            meta["current_snapshot_id"] = new_id
        meta["last_snapshot_id"] = new_id
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        # commit point
        _atomic_write_json(self._hint, {"version": version + 1})
        return new_id

    def _write_manifests_v2(
        self,
        new_id: int,
        prev_id: int | None,
        added_files: list[dict],
        removed: set[str],
        touched_buckets: list[int] | None,
    ) -> tuple[int, int]:
        """Write per-(spec, bucket) manifests for the touched refs + the
        manifest list; untouched refs reference their previous manifest
        files unread.  Returns (total_files, total_rows).

        ``touched_buckets`` is CURRENT-spec bucket ids; after a rescale
        it expands to every older spec's covering ref (the same
        congruence rule ``files()`` prunes with), so removals inside
        old-spec files are dropped from exactly the manifests that could
        hold them — commit cost stays O(touched refs)."""
        added_by_ref: dict[tuple[int, int], list[dict]] = {}
        for e in added_files:
            added_by_ref.setdefault(
                (int(e.get("spec_id", 0)), int(e["bucket"])), []
            ).append(e)

        prev_list: dict[str, dict] = {}
        if prev_id is not None:
            prev_list = self.manifest_list(prev_id) or {}

        touched: set[tuple[int, int]] = set(added_by_ref)
        if touched_buckets is not None:
            spec_nb = {s["spec_id"]: s["num_buckets"] for s in self.bucket_specs()}
            cur_nb = int(self.metadata()["num_buckets"])
            for b in touched_buckets:
                for s, nb in spec_nb.items():
                    touched.add((s, int(b) % nb))
        elif removed:
            # caller didn't say where the removals live — inspect all
            # previous refs (correct, just not O(touched))
            touched |= {parse_ref_key(k) for k in prev_list}

        new_list: dict[str, dict] = {
            k: dict(ref)
            for k, ref in prev_list.items()
            if parse_ref_key(k) not in touched
        }
        for s, b in sorted(touched):
            carried: list[dict] = []
            prev_ref = prev_list.get(ref_key(s, b))
            if prev_ref is not None:
                carried = [
                    e
                    for e in self._read_bucket_manifest(prev_ref["manifest"])
                    if e["path"] not in removed
                ]
            entries = carried + added_by_ref.get((s, b), [])
            if not entries:
                continue  # ref emptied: drop it from the list
            fname = (
                f"snap-{new_id}-b{b}.manifest.json"
                if s == 0
                else f"snap-{new_id}-s{s}b{b}.manifest.json"
            )
            _atomic_write_json(
                os.path.join(self.meta_dir, fname),
                {"snapshot_id": new_id, "bucket": b, "spec_id": s, "files": entries},
            )
            new_list[ref_key(s, b)] = {
                "manifest": fname,
                "files": len(entries),
                "rows": sum(e["rows"] for e in entries),
                # metadata-only fold-policy inputs (merge-on-read): one
                # delta COMMIT may fan out into several files per bucket
                # (write salt), so the policy counts commits, not files
                "delta_files": sum(1 for e in entries if e.get("delta")),
                "delta_commits": len(
                    {commit_tag(e["path"]) for e in entries if e.get("delta")}
                ),
            }
        _atomic_write_json(
            os.path.join(self.meta_dir, f"snap-{new_id}.manifest-list.json"),
            {"snapshot_id": new_id, "buckets": new_list},
        )
        total_files = sum(r["files"] for r in new_list.values())
        total_rows = sum(r["rows"] for r in new_list.values())
        return total_files, total_rows

    #: widenings that preserve every value exactly (Iceberg's promotion
    #: rules for primitives, minus decimal which icebox doesn't store)
    _WIDEN_OK = {("int", "long"), ("float", "double")}

    #: columns the engine's identity/ordering contract depends on — the
    #: CDC key, the bucket column, and the meta block can't be renamed
    #: or retyped without breaking LWW resolution and bucket pruning
    def _protected_cols(self) -> set[str]:
        return {
            self.metadata()["bucket_column"],
            "conv_id",
            "turn_idx",
            "_ts",
            "_lsn",
            "_src_part",
            "_op",
        }

    def _history_additive(self) -> bool:
        """True while no rename/widen has ever changed an existing
        column id's (name, type) — i.e. every retained schema era is a
        subset-by-id of the current schema (dropped ids excepted).
        Under a purely additive history every data file is
        name-compatible with the current schema by construction."""
        cur = {f["id"]: f for f in self.schema_fields()}
        for s in self.metadata()["schemas"]:
            for f in s["fields"]:
                c = cur.get(f["id"])
                if c is not None and (
                    c["name"] != f["name"] or c["type"] != f["type"]
                ):
                    return False
        return True

    def _backfill_schema_ids(self) -> int:
        """Stamp ``schema_id`` on live manifest entries that predate the
        stamp (files written before round 4).  Runs before every
        non-additive schema commit: unstamped files would otherwise take
        the name-based read path forever, so a later rename would read
        their values back NULL and a drop-then-readd of the same name
        would resurrect them.  Stamping with the CURRENT schema id is
        exact while the history is purely additive (the file's physical
        columns are a by-id subset of the current schema; missing ones
        backfill NULL) — and non-additive commits always backfill first,
        so that precondition holds at the first rename/widen/drop.  If
        unstamped files coexist with an already non-additive history
        (a table mutated by pre-backfill code), the correct era is
        unrecoverable and the commit REFUSES rather than guessing.
        Returns the number of entries stamped."""
        meta = self.metadata()
        snap_id = self.head_id(meta)
        if snap_id is None:
            return 0
        sid_cur = int(meta["current_schema_id"])
        ml = self.manifest_list(snap_id)
        if ml is not None:
            targets = [
                (ref["manifest"], None) for ref in ml.values()
            ]
        else:
            targets = [(f"snap-{snap_id}.manifest.json", None)]
        n = 0
        checked_additive = False
        for fname, _ in targets:
            p = os.path.join(self.meta_dir, fname)
            with open(p) as fh:
                m = json.load(fh)
            if all("schema_id" in e for e in m["files"]):
                continue
            if not checked_additive:
                if not self._history_additive():
                    raise ValueError(
                        "table holds data files without a recorded schema_id "
                        "but its schema history is already non-additive; the "
                        "files' true schema era is unrecoverable — compact "
                        "(fold/rewrite) them before further rename/widen/drop"
                    )
                checked_additive = True
            for e in m["files"]:
                if "schema_id" not in e:
                    e["schema_id"] = sid_cur
                    n += 1
            _atomic_write_json(p, m)
        return n

    def rename_map(self) -> dict[str, str]:
        """``{old_name: current_name}`` for every column that was ever
        renamed, derived from the schema-era history by COLUMN ID.  An
        old name that was later reused by a different (fresh-id) column
        is excluded — the current binding of that name wins.  The ingest
        path maps incoming changelog columns through this so a rename
        does not split data across two half-populated columns
        (schema.py::align_renames)."""
        cur = {f["id"]: f["name"] for f in self.schema_fields()}
        cur_names = set(cur.values())
        out: dict[str, str] = {}
        for s in self.metadata()["schemas"]:
            for f in s["fields"]:
                name = cur.get(f["id"])
                if (
                    name is not None
                    and f["name"] != name
                    and f["name"] not in cur_names
                ):
                    out[f["name"]] = name
        return out

    def _commit_schema(self, new_fields: list[dict]) -> int:
        """Append a schema (metadata-only commit), return its id.
        Backfills ``schema_id`` on any pre-stamp manifest entries first
        (see _backfill_schema_ids) so the id-aligned read path covers
        every live file from the first non-additive evolution on."""
        self._backfill_schema_ids()
        meta = self.metadata()
        version = self._version()
        schema_id = max(s["schema_id"] for s in meta["schemas"]) + 1
        meta["schemas"].append({"schema_id": schema_id, "fields": new_fields})
        meta["current_schema_id"] = schema_id
        meta["last_column_id"] = max(
            [f["id"] for f in new_fields] + [meta["last_column_id"]]
        )
        _atomic_write_json(
            os.path.join(self.meta_dir, f"v{version + 1}.metadata.json"), meta
        )
        _atomic_write_json(self._hint, {"version": version + 1})
        return schema_id

    def rename_column(self, old: str, new: str) -> int:
        """Rename a payload column (metadata-only; column id unchanged —
        the Iceberg identity rule).  Files written under older schemas
        keep their physical name; the read path re-aligns them by id
        (lake/read.py).  Key/bucket/meta columns are protected."""
        if old in self._protected_cols():
            raise ValueError(f"cannot rename protected column {old!r}")
        fields = [dict(f) for f in self.schema_fields()]
        names = {f["name"] for f in fields}
        if old not in names:
            raise KeyError(f"no column {old!r}")
        if new in names:
            raise ValueError(f"column {new!r} already exists")
        for f in fields:
            if f["name"] == old:
                f["name"] = new
        return self._commit_schema(fields)

    def widen_column(self, name: str, new_type: str) -> int:
        """Widen a payload column's type (int→long, float→double; the
        exact-value promotions).  Column id unchanged; old files read
        back through a cast (lake/read.py)."""
        if name in self._protected_cols():
            raise ValueError(f"cannot retype protected column {name!r}")
        fields = [dict(f) for f in self.schema_fields()]
        for f in fields:
            if f["name"] == name:
                if f["type"] == new_type:
                    return self.metadata()["current_schema_id"]
                if (f["type"], new_type) not in self._WIDEN_OK:
                    raise ValueError(
                        f"cannot widen {name!r} {f['type']} → {new_type}; "
                        f"allowed: {sorted(self._WIDEN_OK)}"
                    )
                f["type"] = new_type
                return self._commit_schema(fields)
        raise KeyError(f"no column {name!r}")

    def drop_column(self, name: str) -> int:
        """Drop a payload column (metadata-only — data files keep the
        bytes, reads exclude the id).  Re-adding the same NAME later
        mints a FRESH id, so old values can never resurrect (ids are
        never reused — the rule that makes rename/drop unambiguous)."""
        if name in self._protected_cols():
            raise ValueError(f"cannot drop protected column {name!r}")
        fields = [dict(f) for f in self.schema_fields()]
        kept = [f for f in fields if f["name"] != name]
        if len(kept) == len(fields):
            raise KeyError(f"no column {name!r}")
        return self._commit_schema(kept)

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
                    "type": spark_to_type(f.dataType),
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
