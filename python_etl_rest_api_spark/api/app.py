"""FastAPI orchestration shell: Spark jobs via REST (reference api/main.py).

Replicates the reference's endpoint surface and error model exactly
(reference api/main.py:12-39, api/first100.py:3-48):
- POST /extract  {number: int in [1,100]} -> 400 on out-of-range/duplicate
- GET  /missing  -> Gauss-sum missing number; 400 unless exactly 1 extracted
- POST /reset    -> fresh state
plus the engine endpoints that make this an analytics service:
- POST /etl/run                  -> run the cleaning pipeline on a CSV path
- GET  /view/daily_company_totals?date=/start=/end= -> the flagship view
- GET  /catalog, /catalog/{name} -> the whole analytics catalog over REST
- GET  /health

State is table-backed (append-only parquet store, re-read inside every
operation, duplicate races adjudicated read-after-write - see
operators/first100.py), not a process global: multiple workers converge
on the same state, unlike the reference (SURVEY.md L7). A single
SparkSession lives for the app's lifetime. Client-supplied paths are
confined to a configured data root (403 outside it).
"""

from __future__ import annotations

import os
import tempfile

try:
    from fastapi import FastAPI, HTTPException
    from pydantic import BaseModel, Field
    HAVE_FASTAPI = True
except ImportError:  # container may lack fastapi; engine still importable
    HAVE_FASTAPI = False

from pyspark.sql import functions as F

from ..operators.analytics import daily_company_totals
from ..operators.clean import build_dim_fact, clean_pipeline
from ..operators.first100 import First100, ValidationError
from ..sources.csv_source import read_charges_csv

MAX_PAGE = 10_000


def paginate(view, limit: int, offset: int = 0, after: tuple | None = None):
    """Bounded, deterministic page of an unbounded view.

    Sorts on ALL view columns (a total order regardless of whether any
    column prefix is a unique key, so pages can never overlap or drop
    rows) and clamps limit to [1, MAX_PAGE]. Two paging modes:

    - offset (default): fetches the first offset+limit rows
      (TakeOrderedAndProject JVM-side) and slices - never a full-view
      collect, so a 100 TB-scale warehouse can't OOM the driver; but a
      deep page re-fetches and discards its prefix on the driver,
      O(offset+limit) per page.
    - keyset (``after`` = values of the view's leading two columns from
      the last row of the previous page): filters
      ``(c1, c2) > (a1, a2)`` BEFORE the sort+limit, O(limit) per page
      at any depth, and the predicate prunes at the scan. Requires the
      leading two columns to be a unique key of the view - true for
      daily_company_totals whose grain IS (company_name,
      transaction_date); callers paging other views through this helper
      must ensure the same or successive pages may skip ties.

    Returns (rows, limit, offset)."""
    limit = max(1, min(limit, MAX_PAGE))
    cols = view.columns
    if after is not None:
        a1, a2 = after
        c1, c2 = F.col(cols[0]), F.col(cols[1])
        page = (view.filter((c1 > F.lit(a1))
                            | ((c1 == F.lit(a1)) & (c2 > F.lit(a2))))
                .orderBy(*cols).limit(limit).collect())
        return page, limit, 0
    offset = max(0, offset)
    rows = view.orderBy(*cols).limit(offset + limit).collect()[offset:]
    return rows, limit, offset


def build_app(spark=None, state_path: str | None = None,
              data_root: str | None = None):
    """``data_root`` confines every client-supplied filesystem path
    (csv_path, out_dir, warehouse_dir): paths are realpath-resolved and
    must stay under the root, else 403 (round-1 advice: unauthenticated
    endpoints must not read or overwrite arbitrary host paths). Default
    root: $SPARK_ETL_DATA_ROOT, else the system temp dir."""
    if not HAVE_FASTAPI:
        raise RuntimeError("fastapi not installed in this environment")
    if spark is None:
        from ..session import get_spark
        spark = get_spark("python_etl_rest_api_spark-api")
    state_path = state_path or os.path.join(
        tempfile.gettempdir(), "first100_state")
    data_root = os.path.realpath(
        data_root or os.environ.get("SPARK_ETL_DATA_ROOT")
        or tempfile.gettempdir())

    def _confined(client_path: str) -> str:
        p = os.path.realpath(client_path)
        if p != data_root and not p.startswith(data_root + os.sep):
            raise HTTPException(
                status_code=403,
                detail=f"path outside data root {data_root}: {client_path}")
        return p

    app = FastAPI(title="python_etl_rest_api_spark",
                  description="PySpark-native analytics engine - "
                              "Spark jobs orchestrated via REST")
    state = First100(spark, store_path=state_path)

    class ExtractRequest(BaseModel):
        # mirror reference api/main.py:12-13 (Pydantic ge/le -> 422; the
        # explicit range check in First100 -> 400 for raw ints)
        number: int = Field(..., ge=1, le=100)

    @app.get("/health")
    def health():
        return {"status": "ok", "spark_version": spark.version}

    @app.post("/extract")
    def extract(req: ExtractRequest):
        try:
            return state.extract(req.number)
        except ValidationError as e:  # reference api/main.py:24-25
            raise HTTPException(status_code=400, detail=str(e))

    @app.get("/missing")
    def missing():
        try:
            return {"missing": state.missing()}
        except ValidationError as e:  # reference api/main.py:32-33
            raise HTTPException(status_code=400, detail=str(e))

    @app.post("/reset")
    def reset():
        return state.reset()

    @app.post("/etl/run")
    def etl_run(csv_path: str, out_dir: str):
        """The reference's batch ETL (etl/03_transform_and_load.py) as an
        on-demand Spark job: clean + quarantine + dim/fact parquet."""
        csv_path = _confined(csv_path)
        out_dir = _confined(out_dir)
        if not os.path.exists(csv_path):
            raise HTTPException(status_code=404, detail=f"no such file: {csv_path}")
        raw = read_charges_csv(spark, csv_path)
        clean, critical = clean_pipeline(raw)
        clean = clean.cache()
        companies, charges = build_dim_fact(clean)
        counts = {"original": raw.count(), "clean": clean.count(),
                  "critical": critical.count()}
        from ..operators.load import atomic_overwrite
        atomic_overwrite(clean, os.path.join(out_dir, "clean"))
        atomic_overwrite(critical, os.path.join(out_dir, "critical"))
        atomic_overwrite(companies, os.path.join(out_dir, "companies"))
        atomic_overwrite(charges, os.path.join(out_dir, "charges"))
        return {"counts": counts, "out_dir": out_dir}

    @app.get("/view/daily_company_totals")
    def view_daily(warehouse_dir: str, date: str | None = None,
                   start: str | None = None, end: str | None = None,
                   limit: int = 1000, offset: int = 0,
                   after: str | None = None):
        """The flagship view with the reference's two filter patterns
        (readme.md:156-162): date equality and BETWEEN.

        Responses are paginated via :func:`paginate` (default page 1000,
        hard cap ``MAX_PAGE``): the view is unbounded in the date-range
        case and an uncapped collect of a 100 TB-scale warehouse would
        OOM the driver. Two paging styles:

        - ``offset=N`` - simple but O(offset+limit) per page;
        - ``after=<JSON [company_name, transaction_date]>`` - keyset
          cursor over the view's grain, O(limit) at any depth. Each
          response carries ``next``: pass it back verbatim as ``after``
          for the following page (null when the page was short = done).
        """
        warehouse_dir = _confined(warehouse_dir)
        charges = spark.read.parquet(os.path.join(warehouse_dir, "charges"))
        companies = spark.read.parquet(os.path.join(warehouse_dir, "companies"))
        view = daily_company_totals(charges, companies)
        if date:
            view = view.filter(F.col("transaction_date") == F.lit(date).cast("date"))
        elif start and end:
            view = view.filter(F.col("transaction_date").between(start, end))
        cursor = None
        if after is not None:
            import json
            try:
                cursor = json.loads(after)
                assert isinstance(cursor, list) and len(cursor) == 2
                cursor = (cursor[0], str(cursor[1]))
            except (ValueError, AssertionError):
                raise HTTPException(
                    status_code=400,
                    detail='after must be a JSON ["company","YYYY-MM-DD"] pair')
        page, limit, offset = paginate(view, limit, offset, after=cursor)
        nxt = None
        if cursor is not None and len(page) == limit:
            last = page[-1]
            nxt = [last[view.columns[0]], str(last[view.columns[1]])]
        return {"rows": [r.asDict() for r in page],
                "limit": limit, "offset": offset, "next": nxt}

    @app.get("/catalog")
    def catalog_index():
        """The whole analytics surface, discoverable: every registered
        catalog entry (name + first docstring line), so a client can
        enumerate what the engine can compute."""
        from .. import registry
        return {"count": len(registry.QUERIES),
                "queries": {n: (fn.__doc__ or "").strip().splitlines()[0]
                            for n, fn in sorted(registry.QUERIES.items())}}

    @app.get("/catalog/{name}")
    def catalog_run(name: str, sf_dir: str, limit: int = 1000,
                    offset: int = 0):
        """Run any registered catalog entry against a confined dataset
        directory and return a bounded page - the whole 172-entry
        analytics surface served over REST with the same pagination
        discipline as the flagship view (total-order sort, MAX_PAGE
        cap, never an unbounded collect)."""
        from .. import registry
        if name not in registry.QUERIES:
            raise HTTPException(status_code=404,
                                detail=f"no such catalog entry: {name}")
        sf_dir = _confined(sf_dir)
        df = registry.QUERIES[name](spark, sf_dir)
        page, limit, offset = paginate(df, limit, offset)
        return {"name": name, "columns": df.columns,
                "rows": [r.asDict() for r in page],
                "limit": limit, "offset": offset}

    return app


def main() -> None:
    """CLI entry (reference api/main.py:41-57): --extract N reports the
    missing number without HTTP."""
    import argparse
    parser = argparse.ArgumentParser(description="First100 CLI")
    parser.add_argument("--extract", type=int, required=True)
    args = parser.parse_args()
    from ..session import get_spark
    state = First100(get_spark("first100-cli"))
    try:
        state.extract(args.extract)
        print(f"extracted: {args.extract}")
        print(f"missing:   {state.missing()}")
    except ValidationError as e:
        print(f"error: {e}")
        raise SystemExit(1)


if __name__ == "__main__":
    main()
