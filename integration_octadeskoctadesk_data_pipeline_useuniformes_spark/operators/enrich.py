"""Batched external-lookup enrichment (S9/J5, reference chat.py:195-295).

The reference enriches each chat with 3 serial HTTP round-trips per row
on the driver — the slowest possible shape. When the lookup target is a
real remote service (not a joinable table), the Spark-native shape is:

- ``mapInPandas`` so lookups run ON EXECUTORS, parallel per partition,
  with Arrow-batched transfer;
- one ``lookup_fn(keys)`` call per batch (batch the service's API),
  never per row;
- optional client-side rate limiting per executor task (token pacing),
  because 1000 executors hitting a SaaS API amplify 1000×;
- failures carried IN-BAND as ``error`` / ``error_detail`` columns
  (reference chat.py:234-236, 289-291 — T4): one bad key neither kills
  the task nor drops the row.

When the lookup target CAN be expressed as a table, prefer a join — see
SURVEY §2.4 J5; this operator is only for genuinely external services.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Mapping

from pyspark.sql import DataFrame

#: signature of the user-supplied batch lookup:
#: keys -> {key: {field: value}}; raise to signal a whole-batch failure
LookupFn = Callable[[list], Mapping]


def batched_lookup_enrich(
    df: DataFrame,
    lookup_fn: LookupFn,
    key_col: str,
    result_fields: dict[str, str],
    batch_size: int = 100,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    rate_limit_batches_per_sec: float | None = None,
) -> DataFrame:
    """Enrich ``df`` with fields fetched from an external service.

    ``result_fields`` maps new column name -> Spark SQL type string.
    Output schema = input columns + result fields + ``error`` string
    column (null on success). Retries a failed batch ``max_retries``
    times with exponential backoff (reference ticket.py:123-138), then
    falls back to per-key error rows rather than failing the task.
    """
    import pandas as pd

    in_schema = df.schema
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in in_schema.fields]
        + [f"`{name}` {typ}" for name, typ in result_fields.items()]
        + ["`error` string"]
    )
    names = list(result_fields)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        min_interval = (
            1.0 / rate_limit_batches_per_sec if rate_limit_batches_per_sec else 0.0
        )
        last_call = 0.0
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                keys = chunk[key_col].tolist()

                if min_interval:
                    wait = min_interval - (time.monotonic() - last_call)
                    if wait > 0:
                        time.sleep(wait)
                last_call = time.monotonic()

                results, batch_err = {}, None
                for attempt in range(max_retries):
                    try:
                        results = dict(lookup_fn(keys))
                        break
                    except Exception as exc:  # retry, then degrade in-band
                        batch_err = f"{type(exc).__name__}: {exc}"
                        if attempt < max_retries - 1:
                            time.sleep(backoff_s * (2**attempt))

                for name in names:
                    chunk[name] = [
                        (results.get(k) or {}).get(name) for k in keys
                    ]
                chunk["error"] = [
                    batch_err
                    if batch_err
                    else (None if k in results else "key not found")
                    for k in keys
                ]
                yield chunk

    return df.mapInPandas(run, out_ddl)
