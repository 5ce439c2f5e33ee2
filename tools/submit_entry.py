"""spark-submit launcher shim.

``spark-submit path/to/cli.py`` runs the file as a parentless script,
breaking the package's relative imports; spark-submit instead ships the
package via ``--py-files dist/engine.zip`` (on the driver and executor
PYTHONPATH) and launches this shim, which imports it normally.
"""

import sys

from ocrd_tesserocr_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
