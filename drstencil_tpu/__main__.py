"""``python -m drstencil_tpu`` — alias for the compiler CLI."""

import sys

from drstencil_tpu.cli import main

sys.exit(main())
