"""Corpus-curation CLI — thin source-checkout wrapper.

The real CLI lives in `singer_spark.curate_cli` (installed as the
`singer-spark-curate` console script by pyproject.toml); this wrapper
keeps `python tools/curate.py ...` working from an uninstalled checkout.
"""

from __future__ import annotations

import os
import sys

# source-checkout mode: insert(0) makes THIS checkout's singer_spark
# shadow any pip-installed copy — running tools/curate.py means you want
# the code sitting next to it
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from singer_spark.curate_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
