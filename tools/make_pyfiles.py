#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission.

    python tools/make_pyfiles.py [dest.zip]     # default dist/xcrawl3r_spark.zip

The zip contains the full ``xcrawl3r_spark`` package; pass it to
``spark-submit --py-files`` so executor Python workers can import the
pandas-UDF stages (extraction, image decode, Bloom folds).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xcrawl3r_spark.session import build_pkg_zip  # noqa: E402


def main() -> None:
    dest = sys.argv[1] if len(sys.argv) > 1 else "dist/xcrawl3r_spark.zip"
    print(build_pkg_zip(dest, force=True))


if __name__ == "__main__":
    main()
