import sys

from folve_tpu.cli import main

sys.exit(main())
