import sys

from mumemto_tpu.cli import main

sys.exit(main())
