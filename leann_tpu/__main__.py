import sys

from leann_tpu.cli.main import main

if __name__ == "__main__":
    sys.exit(main())
