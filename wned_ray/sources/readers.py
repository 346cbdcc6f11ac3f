"""Source readers for the reference's native file formats (S1/S2/S4/S5).

The engine's tables are parquet-first, but a user of the reference
arrives with TSV alias/edge files, directories of raw text, and
``<doc ...>...</doc>`` dump files. Each reader lands those as a
``ray.data.Dataset`` with the SAME schema the rest of the engine
consumes, so `switch the reader, keep the pipeline` holds:

- ``read_alias_tsv``  — ``entity \\t alias \\t source \\t freq`` rows ->
  the alias dim schema (``KBExtractor.extractAlias`` sink format,
  ``/root/reference/src/ca/ualberta/entitylinking/kb/KBExtractor.java``).
- ``read_edges_tsv``  — ``src \\t dst \\t weight`` -> the graph-edge
  schema (``WikiGraphExtractor`` edge sink).
- ``read_text_dir``   — one document per file -> (doc_id, text); the
  raw-text corpus reader (S2).
- ``read_doc_dump``   — files of concatenated ``<doc id=.. title=..>``
  blocks -> one row per block; the Ray-native recast of the reference's
  SAX callback-per-record dump reader (S1, wikixmlj ``WikiXMLParser``):
  files are the parallel unit (one flat_map task per file, streaming),
  the callback becomes a vectorized per-file parse emitting rows.

All readers are lazy Datasets — nothing is collected on the driver.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.csv as pacsv


def read_alias_tsv(paths):
    """TSV (entity, alias, source, freq), no header -> alias dim Dataset."""
    import ray.data as rd

    return rd.read_csv(
        paths,
        read_options=pacsv.ReadOptions(
            column_names=["entity", "alias", "source", "freq"]),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            column_types={"entity": pa.string(), "alias": pa.string(),
                          "source": pa.string(), "freq": pa.int64()}),
        file_extensions=None)


def read_edges_tsv(paths):
    """TSV (src, dst, weight), no header -> graph-edge Dataset."""
    import ray.data as rd

    return rd.read_csv(
        paths,
        read_options=pacsv.ReadOptions(column_names=["src", "dst", "weight"]),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
        convert_options=pacsv.ConvertOptions(
            column_types={"src": pa.string(), "dst": pa.string(),
                          "weight": pa.int64()}),
        file_extensions=None)


def read_text_dir(path):
    """Directory of text files -> (doc_id, text), one row per FILE.

    doc_id is the file path (stable, unique); decode is utf-8 with
    replacement so one bad byte can't kill a shard."""
    import ray.data as rd

    files = rd.read_binary_files(path, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        texts = [b.decode("utf-8", "replace")
                 for b in batch["bytes"].to_pylist()]
        return pa.table({"doc_id": batch["path"],
                         "text": pa.array(texts, pa.string())})

    return files.map_batches(to_rows, batch_format="pyarrow")


def read_jsonl(paths, columns=None):
    """JSONL document files -> Dataset, optionally column-pruned.

    The de-facto interchange format for LLM training corpora; Ray's
    native ``read_json`` handles sharded/compressed files, and the
    optional projection keeps the read pruned the same way the parquet
    readers pass ``columns=``."""
    import ray.data as rd

    ds = rd.read_json(paths)
    return ds.select_columns(list(columns)) if columns else ds


_DOC_RE = re.compile(
    r'<doc\s+id="(?P<id>[^"]*)"\s+title="(?P<title>[^"]*)"\s*>'
    r"(?P<body>.*?)</doc>", re.DOTALL)


def read_doc_dump(path):
    """Dump files of ``<doc id=".." title="..">body</doc>`` blocks ->
    (doc_id, title, text) Dataset, one row per block.

    The callback-per-record dump reader recast Ray-Data-first: each
    FILE is one flat-map task (the dump is sharded into many files at
    scale, so parallelism = shard count), and the per-record callback
    becomes a single compiled-regex scan emitting all of the file's
    rows at once. Unterminated or malformed blocks are skipped, not
    fatal (the reference's SAX reader tolerates the same)."""
    import ray.data as rd

    files = rd.read_binary_files(path, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        ids, titles, bodies = [], [], []
        for blob in batch["bytes"].to_pylist():
            for m in _DOC_RE.finditer(blob.decode("utf-8", "replace")):
                ids.append(m.group("id"))
                titles.append(m.group("title"))
                bodies.append(m.group("body").strip())
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "title": pa.array(titles, pa.string()),
                         "text": pa.array(bodies, pa.string())})

    return files.map_batches(parse, batch_format="pyarrow")
