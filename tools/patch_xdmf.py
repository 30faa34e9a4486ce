"""Repair a truncated XDMF temporal collection (tools/patch_xdmf.py analog).

If a run was killed mid-write, the .xdmf may be cut off; this drops any
incomplete trailing <Grid> block and closes the document properly.

Usage: python tools/patch_xdmf.py <file.xdmf>
"""

from __future__ import annotations

import sys


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        return 1
    path = sys.argv[1]
    text = open(path).read()
    if text.rstrip().endswith("</Xdmf>"):
        print("already well-formed")
        return 0
    # keep everything up to the last complete uniform grid
    marker = "   </Grid>"
    idx = text.rfind(marker)
    if idx < 0:
        print("no complete grid block found")
        return 1
    fixed = text[: idx + len(marker)] + "\n  </Grid>\n </Domain>\n</Xdmf>\n"
    open(path, "w").write(fixed)
    print(f"patched {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
