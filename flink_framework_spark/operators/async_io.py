"""Async-IO enrichment — Flink's ``AsyncDataStream.unorderedWait``
(SURVEY.md §2 [F]): enrich a stream against an external service with
bounded in-flight concurrency, without blocking a task slot per call.

Spark shape: ``mapInPandas`` where each Arrow batch drives an asyncio
event loop — per-batch fan-out with a concurrency cap, results joined
back positionally. The service call here is injected (and faked
deterministically in tests); a real deployment passes an aiohttp/grpc
coroutine.
"""

from __future__ import annotations

import asyncio
from typing import Awaitable, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    fetch: Callable[[object], Awaitable[object]],
    in_col: str,
    out_col: str,
    out_type: str = "string",
    max_concurrency: int = 32,
) -> DataFrame:
    """Add ``out_col = await fetch(row[in_col])`` with at most
    ``max_concurrency`` calls in flight per Arrow batch."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} {out_type}"]
    )

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        async def enrich_batch(values: list) -> list:
            sem = asyncio.Semaphore(max_concurrency)

            async def one(v):
                async with sem:
                    return await fetch(v)

            return await asyncio.gather(*[one(v) for v in values])

        for pdf in batches:
            results = asyncio.run(enrich_batch(list(pdf[in_col])))
            out = pdf.copy()
            out[out_col] = results
            yield out

    return df.mapInPandas(run_batches, schema=out_schema)
