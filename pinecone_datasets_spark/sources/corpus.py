"""Text-corpus ingestion sources: JSONL / CSV / raw text files.

The reference library reads only Parquet (`dataset_fsreader.py:75-151`);
real training-data pipelines ingest line-delimited JSON (optionally
gzipped), CSV exports, and directories of raw text files long before
anything is columnar. These sources make that first hop Spark-native
with the three properties that matter at 100 TB:

- **Explicit schema, never inference.** `spark.read.json` without a
  schema runs a full extra pass over every byte just to guess types; at
  corpus scale that doubles ingest cost and can still guess wrong on
  sparse fields. Every reader here requires a `StructType` up front, so
  the only scan is the real one.
- **One-pass corrupt-record quarantine.** Malformed lines land in a
  `quarantined` frame (originating file + raw line) instead of killing
  the job or vanishing silently. A crawl with 0.01% broken lines is
  10 GB of evidence at 100 TB; losing it silently is how corpus bugs
  ship. Both frames are lazy projections of ONE scan.
- **Compression and layout for free.** `.jsonl.gz` / `.csv.gz` decode
  in-flight (codec from the file extension), `pathGlobFilter` prunes
  non-data files, and `recursiveFileLookup` walks nested crawl layouts
  without a driver-side listing loop.

Design note — parse as an EXPRESSION, not a file format. Spark's native
`spark.read.json/csv` refuses any query whose scan touches only the
internal corrupt-record column (SPARK-21610 / `QUERY_ONLY_CORRUPT_
RECORD_COLUMN`), which is exactly what a quarantine audit is; the
documented workaround is caching the parse — a side effect no library
source should impose. Reading the file as TEXT and applying
`from_json`/`from_csv` keeps the whole pipeline one scan, fully lazy,
inside whole-stage codegen, with the raw line available for free (it IS
the text column). The text source splits gzip-per-file and plain files
by line exactly like the native readers do.

Limitation inherited from line splitting: CSV records with QUOTED
EMBEDDED NEWLINES are not line-delimited and cannot be parsed from a
text scan (the native reader needs `multiLine=true` for them too, which
makes files non-splittable). Such exports should ship as JSONL or
Parquet; `read_jsonl(multiline=True)` covers one-document-per-file JSON.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: Field the PERMISSIVE parse expression parks the raw malformed line in.
CORRUPT_COL = "_corrupt_record"

_PARSE_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": CORRUPT_COL,
}


class CorpusRead(NamedTuple):
    """Result of a quarantining read: parsed rows and rejected lines.

    ``good`` has exactly the caller's schema; ``quarantined`` is
    ``(source_file, raw_record)`` — enough to count, sample, or replay
    the bad shards. Both are lazy single-scan projections of one parse.
    """

    good: DataFrame
    quarantined: DataFrame


def _as_struct(schema) -> StructType:
    """Accept a ``StructType`` or a DDL string ("a long, b string") —
    the DDL form keeps call sites one line for fixture-shaped reads."""
    if isinstance(schema, str):
        return StructType.fromDDL(schema)
    return schema


def _with_corrupt(schema: StructType) -> StructType:
    """Caller schema + the corrupt-record sink field (the parse
    expression needs somewhere to put the raw line of a bad record)."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"schema must not already contain {CORRUPT_COL!r}"
        )
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _ddl(schema: StructType) -> str:
    """StructType → DDL string (``from_csv`` takes DDL, and the Python
    API has no ``toDDL``; ``simpleString`` is the colon format)."""
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def _read_text(
    spark: SparkSession,
    path: str,
    *,
    whole_files: bool = False,
    path_glob: Optional[str] = None,
    recursive: bool = False,
) -> DataFrame:
    # kwargs, not .option(): the reader-level "wholetext" option is
    # silently ignored by the text format (verified on 4.1); the
    # DataFrameReader.text() parameters are the working surface.
    return spark.read.text(
        path,
        wholetext=whole_files,
        pathGlobFilter=path_glob,
        recursiveFileLookup="true" if recursive else None,
    )


def _split(lines: DataFrame, parsed: Column, schema: StructType) -> CorpusRead:
    """(raw line, parse expression) → (good, quarantined) projections.

    A record is corrupt iff the parser populated the sink field OR gave
    up entirely (null struct). The good branch exposes exactly the
    caller's fields; the quarantine branch carries the raw line and its
    file so bad shards can be counted, sampled, or replayed.
    """
    tagged = lines.select(
        F.input_file_name().alias("source_file"),
        F.col("value"),
        parsed.alias("_parsed"),
    )
    bad = F.col("_parsed").isNull() | F.col(
        f"_parsed.{CORRUPT_COL}"
    ).isNotNull()
    # bracket access, not F.col("_parsed.<name>"): a schema field whose
    # name CONTAINS a dot ('user.id' — legal JSON) parsed as a path and
    # failed analysis with FIELD_NOT_FOUND (r11 review, confirmed)
    good = tagged.where(~bad).select(
        *[F.col("_parsed")[f.name].alias(f.name) for f in schema.fields]
    )
    quarantined = tagged.where(bad).select(
        F.col("source_file"), F.col("value").alias("raw_record")
    )
    return CorpusRead(good=good, quarantined=quarantined)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    path_glob: Optional[str] = None,
    recursive: bool = False,
    multiline: bool = False,
) -> CorpusRead:
    """Line-delimited JSON corpus → (good, quarantined) frames.

    ``path`` may be a file, directory, or glob; gzip/bzip2/etc. decode
    from the extension. Blank lines are skipped (not quarantined) —
    trailing newlines and hand-edited files are not data errors.

    ``multiline=True`` switches to one-JSON-document-per-FILE parsing
    (each file is one row, one task — config-style inputs, not the data
    plane, where parallelism would collapse to the file count).
    """
    schema = _as_struct(schema)
    lines = _read_text(
        spark,
        path,
        whole_files=multiline,
        path_glob=path_glob,
        recursive=recursive,
    )
    if not multiline:
        lines = lines.where(F.length(F.trim(F.col("value"))) > 0)
    parsed = F.from_json(F.col("value"), _with_corrupt(schema), _PARSE_OPTS)
    return _split(lines, parsed, schema)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    sep: str = ",",
    path_glob: Optional[str] = None,
    recursive: bool = False,
) -> CorpusRead:
    """CSV corpus → (good, quarantined) frames, same contract as
    ``read_jsonl``. A line is quarantined when any field fails to parse
    under the declared schema (wrong type or arity).

    ``header=True`` drops header lines by PARSE, not position: a line
    whose fields (read as strings) equal the schema's field names is a
    header. Position can't work on a text scan (line order within a
    task is stable but "first line of each file" isn't an expression),
    and the parse rule is strictly better anyway — repeated headers
    from naive file concatenation are dropped too, quoting handled by
    the CSV parser itself.
    """
    schema = _as_struct(schema)
    lines = _read_text(
        spark, path, path_glob=path_glob, recursive=recursive
    )
    lines = lines.where(F.length(F.trim(F.col("value"))) > 0)
    opts = dict(_PARSE_OPTS, sep=sep)
    if header:
        names = [f.name for f in schema.fields]
        as_strings = F.from_csv(
            F.col("value"),
            ", ".join(f"`{n}` string" for n in names),
            {"sep": sep},
        )
        is_header = as_strings == F.struct(
            *[F.lit(n).alias(n) for n in names]
        )
        lines = lines.where(~F.coalesce(is_header, F.lit(False)))
    parsed = F.from_csv(F.col("value"), _ddl(_with_corrupt(schema)), opts)
    return _split(lines, parsed, schema)


def read_text_files(
    spark: SparkSession,
    path: str,
    *,
    whole_files: bool = True,
    path_glob: Optional[str] = None,
    recursive: bool = False,
) -> DataFrame:
    """Directory of raw text files → ``(doc_path, text)``.

    ``whole_files=True`` (one row per file) is the document shape; it
    makes each file one task — fine for crawl shards in the MB range,
    but a single multi-GB file will bottleneck one executor, so shard
    first. ``whole_files=False`` yields one row per LINE with the file
    path attached, which parallelizes by split instead.

    No quarantine frame: raw text cannot fail to parse; encoding repair
    is a downstream transform (`functions/text.py`), not a read concern.
    """
    return _read_text(
        spark,
        path,
        whole_files=whole_files,
        path_glob=path_glob,
        recursive=recursive,
    ).select(
        F.input_file_name().alias("doc_path"),
        F.col("value").alias("text"),
    )


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    max_files_per_trigger: int = 64,
) -> DataFrame:
    """Append-only JSONL directory as a stream (good rows only).

    The streaming file source requires an explicit schema (no inference
    mid-stream); ``maxFilesPerTrigger`` bounds micro-batch size so one
    dumped backlog doesn't become one giant batch. Corrupt lines are
    DROPPED here — streaming state can't hold an unbounded quarantine;
    run the batch ``read_jsonl`` over the same directory when an audit
    of rejects is needed (identical parse expression, identical
    verdicts).
    """
    schema = _as_struct(schema)
    lines = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
        .where(F.length(F.trim(F.col("value"))) > 0)
    )
    # reuse _split so the batch/stream "identical parse expression,
    # identical verdicts" promise holds by construction, not copy-paste
    # (r11 review); streaming just drops the quarantine projection and
    # the batch-only source_file column
    parsed = F.from_json(F.col("value"), _with_corrupt(schema), _PARSE_OPTS)
    return _split(lines, parsed, schema).good
