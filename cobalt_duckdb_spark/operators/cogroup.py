"""Cogrouped-map operator: ``groupBy().cogroup().applyInPandas`` — the
two-sided Arrow UDF shape (SURVEY.md §2.10 U5 family). Used where per-key
logic needs BOTH tables' rows at once and isn't expressible as a join+agg
(e.g. aligning a customer's order timeline against their event timeline).

Scale shape: both sides shuffle once on the key; each task sees one key
group's two frames in memory — bounded by the largest single key, same
constraint as any skewed groupBy (salt hot keys first if needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def orders_events_alignment(orders: DataFrame, events: DataFrame) -> DataFrame:
    """Per-customer comparison of purchase activity (orders table) vs raw
    event activity: counts, value totals, and the time span covered by each
    stream — a data-quality reconciliation job shape."""
    import pandas as pd

    def align(key, odf: pd.DataFrame, edf: pd.DataFrame) -> pd.DataFrame:
        (cust,) = key
        return pd.DataFrame(
            {
                "custkey": [int(cust)],
                "n_orders": [len(odf)],
                "n_events": [len(edf)],
                "order_total": [round(float(odf["o_totalprice"].sum()), 2)],
                "event_total": [round(float(edf["value"].sum()), 2)],
                "orders_span_days": [
                    0
                    if odf.empty
                    else int(
                        (odf["o_orderdate"].max() - odf["o_orderdate"].min()).days
                    )
                ],
                "events_span_hours": [
                    0
                    if edf.empty
                    else int(
                        (edf["ts"].max() - edf["ts"].min()).total_seconds() // 3600
                    )
                ],
            }
        )

    return (
        orders.groupBy("o_custkey")
        .cogroup(events.groupBy("user_id"))
        .applyInPandas(
            align,
            schema=(
                "custkey BIGINT, n_orders BIGINT, n_events BIGINT, "
                "order_total DOUBLE, event_total DOUBLE, "
                "orders_span_days BIGINT, events_span_hours BIGINT"
            ),
        )
    )
