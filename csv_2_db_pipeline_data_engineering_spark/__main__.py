"""CLI entry point — parity with the reference's ``python main.py`` run
(reference ``main.py:41-139``): run the sales ETL against file sinks,
log the summary block, and exit nonzero on any stage failure.

Usage:
    python -m csv_2_db_pipeline_data_engineering_spark \\
        <input.csv> <clean_sink_dir> <rejected_sink_dir> [master]

Exit codes (the reference's stage-halt contract):
    0  pipeline completed with at least one clean row
    1  ingest failed (missing file = retryable, corrupt = not —
       reference two-exception contract), structural validation failed,
       any stage raised, or nothing survived validation
       (reference ``main.py:111-114``).
"""

from __future__ import annotations

import logging
import sys

from pyspark.sql import SparkSession

from .pipeline import run_pipeline
from .session import get_session

logger = logging.getLogger(__name__)


def main(argv: list[str], spark: SparkSession | None = None) -> int:
    if len(argv) < 3 or len(argv) > 4:
        print(__doc__, file=sys.stderr)
        return 2
    filepath, clean_path, rejected_path = argv[:3]
    own_session = spark is None
    if own_session:
        spark = get_session(master=argv[3] if len(argv) == 4 else "local[*]")
    try:
        summary = run_pipeline(spark, filepath, clean_path, rejected_path)
    except FileNotFoundError as exc:
        logger.error("ingest failed (retryable - check upstream delivery): %s", exc)
        return 1
    except RuntimeError as exc:
        logger.error("ingest failed (non-retryable - corrupt source): %s", exc)
        return 1
    except ValueError as exc:
        logger.error("structural validation failed - fix source data: %s", exc)
        return 1
    except Exception:  # noqa: BLE001 - reference exits with traceback on any stage error
        logger.exception("pipeline stage failed")
        return 1
    finally:
        if own_session:
            spark.stop()
    if summary.clean_rows == 0:
        # Reference halts when nothing survives validation (main.py:111-114).
        return 1
    return 0


if __name__ == "__main__":
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s: %(message)s"
    )
    sys.exit(main(sys.argv[1:]))
