"""Placeholder: implemented in a later milestone of this round."""
import sys


def run(argv) -> int:
    print("mumemto label: not yet implemented in this build", file=sys.stderr)
    return 2
