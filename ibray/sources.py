"""Table sources + schema validation (SURVEY.md S1, M10, round-2 item 6).

The north_rule names Lance tables as the corpus format; this container has
no ``lance``/``pylance`` package, so ``read_documents`` is import-gated: it
uses ``ray.data.read_lance`` when (a) the path is a Lance dataset and (b)
the integration is importable, and falls back to parquet otherwise.  The
interface is what matters at 100 TB — swap-in requires no caller changes.

``check_documents_schema`` is the CheckFileType analog
(/root/reference/IB-Tool2.py:249-263): assert the corpus table matches the
input_hint shape *before* any distributed work starts, so a malformed
input fails in milliseconds, not after a cluster-wide read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

# BASELINE.json input_hint: documents(doc_id:string,
#   spans: array<struct<kind:string, text:string, media_ref:string, offset:int32>>)
SPAN_FIELDS = {
    "kind": pa.string(),
    "text": pa.string(),
    "media_ref": pa.string(),
    "offset": pa.int32(),
}


class SchemaError(ValueError):
    pass


def check_documents_schema(schema: pa.Schema) -> None:
    """CheckFileType (M10): raise SchemaError unless the schema carries the
    input_hint columns (extra columns are allowed)."""
    if "doc_id" not in schema.names:
        raise SchemaError("documents: missing column 'doc_id'")
    if not pa.types.is_string(schema.field("doc_id").type):
        raise SchemaError("documents: 'doc_id' must be string, got "
                          f"{schema.field('doc_id').type}")
    if "spans" not in schema.names:
        raise SchemaError("documents: missing column 'spans'")
    t = schema.field("spans").type
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        raise SchemaError(f"documents: 'spans' must be a list, got {t}")
    vt = t.value_type
    if not pa.types.is_struct(vt):
        raise SchemaError(f"documents: 'spans' items must be struct, got {vt}")
    have = {vt.field(i).name: vt.field(i).type for i in range(vt.num_fields)}
    for name, want in SPAN_FIELDS.items():
        if name not in have:
            raise SchemaError(f"documents: span struct missing field '{name}'")
        if have[name] != want:
            raise SchemaError(
                f"documents: span field '{name}' must be {want}, got {have[name]}")


LINE_TYPE = pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))


def validate_world(world_dir: str, require_roads: bool = True,
                   require_aux: bool = False) -> dict:
    """Starter input validation (M11 — the reference's Starter checks the
    config plus every input layer before partition work begins,
    IB-Tool2.py:266-340): verify the world directory carries the documents
    corpus (schema-gated), the road layer (line column of the right type),
    and optionally the aux land-use layers.  Metadata-only — no data scan.
    Returns {layer: row_count}; raises SchemaError on anything missing."""
    import pyarrow.parquet as pq

    report: dict[str, int] = {}
    docs = os.path.join(world_dir, "documents")
    if not (os.path.isdir(docs) or os.path.exists(docs + ".parquet")):
        raise SchemaError(f"world {world_dir}: missing documents table")
    d = docs if os.path.isdir(docs) else docs + ".parquet"
    if os.path.isdir(d):
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        if not parts:
            raise SchemaError(f"world {world_dir}: documents dir is empty")
        check_documents_schema(pq.read_schema(os.path.join(d, sorted(parts)[0])))
        report["documents"] = -1  # per-file metadata only; count not summed
    else:
        meta = pq.read_metadata(d)
        check_documents_schema(pq.read_schema(d))
        report["documents"] = meta.num_rows
    roads = os.path.join(world_dir, "roads.parquet")
    if require_roads:
        if not os.path.exists(roads):
            raise SchemaError(f"world {world_dir}: missing roads.parquet")
        rs = pq.read_schema(roads)
        if "line" not in rs.names or rs.field("line").type != LINE_TYPE:
            raise SchemaError(
                f"world {world_dir}: roads 'line' must be {LINE_TYPE}")
        report["roads"] = pq.read_metadata(roads).num_rows
    for name, needed in (("landuse", require_aux), ("aux_lines", require_aux)):
        p = os.path.join(world_dir, f"{name}.parquet")
        if os.path.exists(p):
            report[name] = pq.read_metadata(p).num_rows
        elif needed:
            raise SchemaError(f"world {world_dir}: missing {name}.parquet")
    return report


def is_lance_dataset(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_documents(path: str, validate: bool = True) -> rd.Dataset:
    """Corpus reader: Lance when available, parquet fallback; schema checked
    at plan-build time (one metadata read, no data scan)."""
    ds = None
    if is_lance_dataset(path):
        try:
            ds = rd.read_lance(path)  # requires the lance integration
        except (ImportError, AttributeError, ModuleNotFoundError):
            ds = None
    if ds is None:
        # skip the driver-side footer prefetch (Ray reads every file's
        # parquet footer through remote tasks at PLAN BUILD — measured
        # ~1.1 s serial for a 245-file corpus dir, a pure Amdahl floor on
        # the headline).  The prefetched sizes only feed block-size
        # estimates; the extraction pipeline materializes immediately, so
        # one-task-per-file scheduling is already the right shape.
        try:
            from ray.data.datasource.parquet_meta_provider import (
                ParquetMetadataProvider,
            )

            class _NoPrefetch(ParquetMetadataProvider):
                def prefetch_file_metadata(self, fragments,
                                           **ray_remote_args):
                    return None

            import warnings as _w

            with _w.catch_warnings():
                # Ray deprecates the meta_provider kwarg (post-May-2025
                # removal); the except arm below is the migration path
                _w.simplefilter("ignore", DeprecationWarning)
                ds = rd.read_parquet(path, meta_provider=_NoPrefetch())
        except (ImportError, TypeError):  # older/newer Ray surface
            ds = rd.read_parquet(path)
    if validate:
        check_documents_schema(pa.schema(ds.schema().base_schema))
    return ds
