"""Serving layer: the datamart query surface, answered natively in Spark.

The reference copies Gold into Postgres and serves HTTP from there
(``spark/gold/processor.py:284-313``, ``api/app/database.py``). This engine
answers the same query shapes directly on the Gold DataFrames/views — at
scale the Gold tables stay queryable in place (Thrift/Connect/BI on the
same plans), and :func:`publish_datamart` remains for pushing copies to an
operational store.

Query shapes reproduced (reference ``api/app/database.py``):

- paginated, dynamically-filtered client risk list + matching total count
  (``:38-68,94-106``) — filters are null-tolerant ranges
  (``col IS NULL OR col >= x``), pagination is ORDER BY key LIMIT/OFFSET;
- point lookup by client id (``:109-132``);
- per-client drilldowns ordered by the child key (``:135-160``);
- 3-row portfolio summary (``db_portfolio.py:22-32``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from home_credit_data_engineering_spark.operators.sampling import paginate
from home_credit_data_engineering_spark.sources.sinks import write_jdbc


@dataclass
class RiskListFilters:
    """Dynamic filters of the client-risk list endpoint
    (reference ``api/app/database.py:38-68``)."""

    risk_segment: str | None = None
    sk_id_curr: int | None = None
    min_income: float | None = None
    min_credit_exposure: float | None = None

    def predicate(self) -> Column:
        pred = F.lit(True)
        if self.risk_segment is not None:
            pred = pred & (F.col("risk_segment") == self.risk_segment)
        if self.sk_id_curr is not None:
            pred = pred & (F.col("SK_ID_CURR") == self.sk_id_curr)
        if self.min_income is not None:
            # Null-tolerant range: NULL income rows stay visible (reference
            # semantics: "col IS NULL OR col >= x").
            pred = pred & (F.col("income").isNull() | (F.col("income") >= self.min_income))
        if self.min_credit_exposure is not None:
            pred = pred & (
                F.col("credit_exposure").isNull()
                | (F.col("credit_exposure") >= self.min_credit_exposure)
            )
        return pred


def client_risk_page(
    profile: DataFrame,
    filters: RiskListFilters | None = None,
    page: int = 1,
    page_size: int = 50,
) -> tuple[int, DataFrame]:
    """(total_count, page) — the list endpoint. One filtered scan feeds
    both the count and the TakeOrderedAndProject page."""
    filtered = profile.filter((filters or RiskListFilters()).predicate())
    total = filtered.count()
    page_df = paginate(
        filtered,
        order_by=[F.col("SK_ID_CURR").asc()],
        limit=page_size,
        offset=(page - 1) * page_size,
    )
    return total, page_df


def client_lookup(profile: DataFrame, sk_id_curr: int) -> DataFrame:
    """Point lookup — one row by client id."""
    return profile.filter(F.col("SK_ID_CURR") == sk_id_curr)


def client_drilldown(
    child: DataFrame, sk_id_curr: int, order_by: str
) -> DataFrame:
    """All child rows (bureau credits / previous apps) for one client,
    ordered by the child key (reference ``api/app/database.py:135-160``)."""
    return child.filter(F.col("SK_ID_CURR") == sk_id_curr).orderBy(
        F.col(order_by).asc()
    )


def portfolio_summary(portfolio: DataFrame) -> DataFrame:
    """Full scan of the 3-row rollup, ordered by segment."""
    return portfolio.orderBy(F.col("risk_segment").asc())


def related_documents(
    spark,
    index_path: str,
    query_docs: DataFrame,
    k: int = 5,
    n_buckets: int = 64,
) -> DataFrame:
    """Index-backed "related documents" endpoint (VERDICT r6 #5): rank
    the corpus behind a persisted BM25 index (``jobs/bm25_index.py``)
    against each query document, self-matches dropped. Unlike the
    tokenize-per-call :func:`~home_credit_data_engineering_spark.
    operators.retrieval.more_like_this`, only the query docs are
    tokenized here — the postings scan partition-prunes to the query
    terms' buckets, so serving cost tracks the query, not the corpus.
    Returns (query_id, doc_id, score, rank)."""
    from home_credit_data_engineering_spark.operators.retrieval import (
        more_like_this_index,
    )

    return more_like_this_index(
        spark, index_path, query_docs, k=k, n_buckets=n_buckets
    )


def publish_datamart(
    tables: dict[str, DataFrame],
    url: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    lowercase_columns: bool = True,
) -> None:
    """K3: overwrite-publish Gold tables to an operational store
    (reference ``spark/gold/processor.py:284-313`` +
    ``datamart_extended.py:78-164``, including the lowercase-rename the
    reference applies for Postgres compatibility)."""
    from home_credit_data_engineering_spark.operators.projections import (
        lowercase_columns as lc,
    )

    for name, df in tables.items():
        out = lc(df) if lowercase_columns else df
        write_jdbc(out, url, name, user=user, password=password, driver=driver)
