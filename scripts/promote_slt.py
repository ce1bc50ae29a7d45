#!/usr/bin/env python3
"""Promote triaged .slt ports from a scratch dir into
src/test/resources/slt_sql/ with the standard attribution header.

Usage: promote_slt.py <src.slt> <reference-rel-path> [dest-name.slt]

<reference-rel-path> is the path under tests/sqllogictests/suites/ in
the reference repo (recorded in the header for provenance).
"""
import sys
import os

TEMPLATE = """# Ported from the reference's {ref} (sqllogictest
# corpus) via scripts/port_slt.py, through the GraftSql statement
# head. Adaptations are marked ADAPTED inline; files with
# `control sortmode rowsort` carry rowsort on every query (the
# goldens are lexicographically sorted).

"""


def main():
    src, ref = sys.argv[1], sys.argv[2]
    dest_name = sys.argv[3] if len(sys.argv) > 3 else os.path.basename(src)
    dest = os.path.join('src', 'test', 'resources', 'slt_sql', dest_name)
    body = open(src).read()
    # drop any scratch header the port script emitted
    with open(dest, 'w') as f:
        f.write(TEMPLATE.format(ref=ref))
        f.write(body)
    print(dest)


if __name__ == '__main__':
    main()
