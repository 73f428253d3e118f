"""Schema normalization for schema-less / mixed-type feeds.

The reference tolerates documents whose fields change type over time:
``DocPackedArray`` regenerates its packing codec upward whenever a doc
doesn't fit the current one (``doc-packed-array.ts:577-729``) and
accepts mixed / scalar-vs-array values (``:188-221``). The Ray engine
is Arrow-typed end to end (SURVEY §1.2), so the equivalent capability
is a NORMALIZATION PASS in front of the build:

- a type-promotion lattice mirroring the codec-upgrade direction
  (null < bool < int64 < float64 < large_string; scalar vs list
  promotes to list of the promoted value type; structs merge fields
  recursively — a field missing from one side is nullable),
- ``rows_to_table``: Python/JSON dict rows -> one Arrow table under
  the promoted schema (per-batch),
- ``normalize_dataset``: two-phase Ray pass — phase 1 folds ONLY the
  per-block schemas on the driver (bytes-sized, never the data),
  phase 2 casts every block to the global promoted schema with
  scalar->list wrapping and stringification where needed. Blocks
  stream; nothing materializes.

After normalization the table feeds ``build_index`` unchanged (nested
structs flatten via stages/flatten.py, M1). Termization semantics for
a promoted-to-string field follow the PROMOTED type — the reference
instead termizes each value by its runtime type; that per-value union
indexing is documented out of scope (SURVEY §8, mixed-type note).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _is_int(t: pa.DataType) -> bool:
    return pa.types.is_integer(t)


def _is_float(t: pa.DataType) -> bool:
    return pa.types.is_floating(t)


def _is_str(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _is_list(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def promote_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Least upper bound of two Arrow types under the upgrade lattice.
    Anything without a numeric/boolean/string/list/struct relationship
    falls back to ``large_string`` (the reference's terminal codec is
    likewise the fully-general one)."""
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    # scalar vs list -> list of promoted element type
    if _is_list(a) and not _is_list(b):
        return pa.large_list(promote_types(a.value_type, b))
    if _is_list(b) and not _is_list(a):
        return pa.large_list(promote_types(b.value_type, a))
    if _is_list(a) and _is_list(b):
        return pa.large_list(promote_types(a.value_type, b.value_type))
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        fields: dict[str, pa.DataType] = {f.name: f.type for f in a}
        for f in b:
            fields[f.name] = (
                promote_types(fields[f.name], f.type) if f.name in fields else f.type
            )
        return pa.struct([pa.field(n, t) for n, t in fields.items()])
    if (_is_int(a) or _is_float(a) or pa.types.is_boolean(a)) and (
        _is_int(b) or _is_float(b) or pa.types.is_boolean(b)
    ):
        # bool < int64 < float64 — the numeric arm of the lattice
        if _is_float(a) or _is_float(b):
            return pa.float64()
        if _is_int(a) or _is_int(b):
            return pa.int64()
        return pa.bool_()
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        return a if a.bit_width >= b.bit_width else b
    # mixed string/number/bool/anything -> stringify (terminal codec)
    return pa.large_string()


def promote_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Global promoted schema: union of field names, each field the
    lattice join of its appearances (absent == null-typed)."""
    fields: dict[str, pa.DataType] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name not in fields:
                fields[f.name] = f.type
                order.append(f.name)
            else:
                fields[f.name] = promote_types(fields[f.name], f.type)
    return pa.schema([pa.field(n, fields[n]) for n in order])


def _stringify(arr: pa.Array) -> pa.Array:
    """Cast any array to large_string, preserving nulls. Non-castable
    values go through repr-free str() of the Python value (bounded:
    this is the terminal lattice arm, hit only by truly mixed data)."""
    try:
        return arr.cast(pa.large_string())
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return pa.array(
            [None if v is None else str(v) for v in arr.to_pylist()],
            type=pa.large_string(),
        )


def cast_column(arr: pa.Array, target: pa.DataType) -> pa.Array:
    """Cast one column to its promoted type, wrapping scalars into
    single-element lists when the target is a list type."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type.equals(target):
        return arr
    if _is_list(target) and not _is_list(arr.type):
        inner = cast_column(arr, target.value_type)
        offsets = pa.array(np.arange(len(arr) + 1, dtype=np.int64))
        wrapped = pa.LargeListArray.from_arrays(offsets, inner)
        if arr.null_count:
            wrapped = pa.compute.if_else(
                pa.compute.is_null(arr), pa.nulls(len(arr), type=target), wrapped
            )
        return wrapped
    if _is_list(target) and _is_list(arr.type):
        # Use the aligned raw pair .values/.offsets — flatten() compacts
        # away the backing ranges of null slots, so it misaligns with
        # .offsets whenever a null slot spans values (legal in Parquet
        # written by other engines, and after slicing).
        inner = cast_column(arr.values, target.value_type)
        offs = arr.offsets.cast(pa.int64())
        mask = pa.compute.is_null(arr) if arr.null_count else None
        return pa.LargeListArray.from_arrays(offs, inner, mask=mask)
    if pa.types.is_struct(target):
        vals = arr if pa.types.is_struct(arr.type) else None
        if vals is None:
            return _stringify(arr)
        cols, names = [], []
        have = {x.name for x in arr.type}
        for f in target:
            names.append(f.name)
            if f.name in have:
                cols.append(cast_column(arr.field(f.name), f.type))
            else:
                cols.append(pa.nulls(len(arr), type=f.type))
        out = pa.StructArray.from_arrays(cols, names)
        if arr.null_count:
            out = pa.compute.if_else(
                pa.compute.is_null(arr), pa.nulls(len(arr), type=target), out
            )
        return out
    if _is_str(target):
        return _stringify(arr)
    return arr.cast(target)


def normalize_batch(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """One block -> the promoted schema (missing columns become null)."""
    cols = []
    for f in schema:
        if f.name in batch.column_names:
            cols.append(cast_column(batch[f.name], f.type))
        else:
            cols.append(pa.nulls(batch.num_rows, type=f.type))
    return pa.table(dict(zip(schema.names, cols)))


def rows_to_table(rows: list[dict]) -> pa.Table:
    """Schema-less dict rows (a JSON feed) -> one promoted-schema Arrow
    table. Per-row singleton schemas are folded through the same
    lattice, so ``{'a': 1}`` then ``{'a': 'x'}`` yields a
    large_string 'a' — the reference would likewise repack upward."""
    singles = []
    for r in rows:
        try:
            singles.append(pa.Table.from_pylist([r]))
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            # row not even self-consistent (e.g. mixed-type list) —
            # stringify every offending value
            singles.append(
                pa.Table.from_pylist(
                    [{k: v if _self_consistent(v) else str(v) for k, v in r.items()}]
                )
            )
    schema = promote_schemas([t.schema for t in singles])
    return pa.concat_tables([normalize_batch(t, schema) for t in singles])


def _self_consistent(v) -> bool:
    if isinstance(v, list):
        kinds = {type(x) for x in v if x is not None}
        return len(kinds) <= 1
    return True


def normalize_dataset(ds):
    """Two-phase streaming normalization of a ``ray.data.Dataset``:

    1. fold per-block SCHEMAS on the driver (one tiny map_batches pass
       shipping serialized schemas only — the data never leaves the
       object store),
    2. ``map_batches`` every block to the promoted schema.

    Returns (normalized_dataset, promoted_schema)."""
    schemas_ds = ds.map_batches(
        lambda b: pa.table(
            {"schema": pa.array([b.schema.serialize().to_pybytes()], pa.large_binary())}
        ),
        batch_format="pyarrow",
    )
    blobs = schemas_ds.take_all()  # one tiny row per block
    schemas = [
        pa.ipc.read_schema(pa.BufferReader(r["schema"])) for r in blobs
    ]
    target = promote_schemas(schemas)

    def to_target(b: pa.Table) -> pa.Table:
        return normalize_batch(b, target)

    return ds.map_batches(to_target, batch_format="pyarrow"), target
