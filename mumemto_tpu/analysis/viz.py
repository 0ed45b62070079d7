"""Placeholder: implemented in a later milestone of this round."""
import sys


def run(argv) -> int:
    print("mumemto viz: not yet implemented in this build", file=sys.stderr)
    return 2
