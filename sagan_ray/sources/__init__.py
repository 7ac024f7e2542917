"""Input sources: parquet readers and the deterministic webpages derivations."""


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` with file-level ``pandas`` schema metadata
    stripped from every block.

    Parquet written by pandas carries a ``b"pandas"`` schema-metadata blob;
    pyarrow Schemas holding it are UNHASHABLE (the decoded metadata contains a
    dict), which silently defeats Ray Data's schema deduplication in every
    downstream shuffle ("Failed to hash the schemas" / "RefBundle with a
    different schema" warnings) and forces repeated full unify_schemas work in
    reduce tasks. Stripping is metadata-only (zero-copy) and fuses into the
    read stage.
    """
    import ray.data as rd

    schema = kwargs.pop("schema", None)
    if schema is None and not kwargs.get("include_paths"):
        # Derive a metadata-free schema from the first file's footer
        # (driver-side, one footer read) and hand it to the reader, so
        # blocks are clean FROM the read — no extra stage, and the
        # fragment-schema unify inside the read task stops warning too.
        try:
            import glob
            import os

            import pyarrow as pa
            import pyarrow.parquet as pq

            first = paths if isinstance(paths, str) else paths[0]
            if os.path.isdir(first):
                root = first
                found = sorted(glob.glob(os.path.join(first, "**", "*.parquet"),
                                         recursive=True))
                first = found[0] if found else None
                if first and "=" in os.path.relpath(first, root):
                    # hive-partitioned layout: the file footer does NOT
                    # carry the partition columns, so a footer-derived
                    # schema would disagree with the blocks Ray builds
                    # (declared schema missing e.g. 'classification').
                    # Fall through to the post-read strip-map instead.
                    first = None
            if first:
                full = pq.read_schema(first).remove_metadata()
                cols = kwargs.get("columns")
                schema = (pa.schema([full.field(c) for c in cols])
                          if cols else full)
        except Exception:
            schema = None  # fall through to the strip-map path

    if schema is not None:
        return rd.read_parquet(paths, schema=schema, **kwargs)
    ds = rd.read_parquet(paths, **kwargs)
    return ds.map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )
