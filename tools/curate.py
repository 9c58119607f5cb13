"""Corpus-curation CLI — thin source-checkout wrapper.

The real CLI lives in `singer_spark.curate_cli` (installed as the
`singer-spark-curate` console script by pyproject.toml); this wrapper
keeps `python tools/curate.py ...` working from an uninstalled checkout.
"""

from __future__ import annotations

import os
import sys

# source-checkout fallback: a pip-installed singer_spark wins on the path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from singer_spark.curate_cli import main  # noqa: E402

if __name__ == "__main__":
    main()
