#!/usr/bin/env python3
"""Convert a reference sqllogictest file into this repo's slt dialect.

Mechanical parts of the port: TAB-separates expected rows using the
query's type string for column count, maps databend's 0/1 boolean
rendering to true/false on B-typed columns, and maps (empty) to the
empty string. Rows whose whitespace tokenization doesn't match the
declared column count are flagged with a `# PORT-CHECK` comment for
manual adjustment (string values containing spaces). Everything else
(type spellings, engine-specific vectors) is reviewed by hand — see
the header comment each ported file carries.

Usage: port_slt.py <reference.test> > out.slt
"""
import re
import sys


def has_toplevel_order_by(sql):
    # 'order by' at paren depth 0 (an OVER clause's ORDER BY does not
    # determine result row order)
    s = sql.lower()
    depth = 0
    i = 0
    while i < len(s):
        c = s[i]
        if c == '(':
            depth += 1
        elif c == ')':
            depth -= 1
        elif depth == 0 and s.startswith('order', i) and (i == 0 or not (s[i-1].isalnum() or s[i-1] == '_')):
            j = i + 5
            while j < len(s) and s[j].isspace():
                j += 1
            if s.startswith('by', j):
                return True
        i += 1
    return False


def fmt_double(t):
    import re as _re
    # Plain integer: keep. Plain decimal text with any nonzero or
    # multi-digit fraction: keep — the runner prints DECIMAL columns at
    # full declared scale (27000.00 stays 27000.00). Only a bare float
    # ".0" tail (Rust shortest-float display) strips, and only
    # overlong/scientific forms re-quantize to the runner's 6dp.
    if _re.fullmatch(r'-?\d+', t):
        return t
    m = _re.fullmatch(r'(-?\d+)\.(\d+)', t)
    if m and len(m.group(2)) <= 6:
        # keep verbatim: DECIMAL columns render at full declared scale
        # and the runner numerically tolerates float-column variants
        return t
    try:
        from decimal import Decimal, ROUND_HALF_UP
        d = Decimal(t)
    except Exception:
        return t
    try:
        q = d.quantize(Decimal('0.000001'), rounding=ROUND_HALF_UP)
    except Exception:  # digits exceed context precision (huge literals)
        return t
    s = format(q.normalize(), 'f')
    if s == '-0':
        s = '0'
    return s


def convert(path):
    lines = open(path).read().splitlines()
    out = []
    i = 0
    force_rowsort = False
    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if stripped.startswith('control '):
            if 'rowsort' in stripped:
                force_rowsort = True
            out.append('# ' + stripped + '  (applied per-query below)')
            i += 1
            continue
        if stripped.startswith('skipif') or stripped.startswith('onlyif'):
            i += 1  # conditionals for other harnesses
            continue
        if stripped.startswith('query'):
            m = re.match(r'query\s+(\S+)(\s+rowsort)?', stripped)
            types = m.group(1) if m else ''
            ncols = len(types)
            qline_at = len(out)
            out.append(line)
            i += 1
            # SQL text until ---- or blank
            sql_txt = []
            while i < len(lines) and lines[i].strip() != '----' and lines[i].strip() != '':
                out.append(lines[i]); sql_txt.append(lines[i]); i += 1
            if 'rowsort' not in out[qline_at] and (
                    force_rowsort or not has_toplevel_order_by(' '.join(sql_txt))):
                out[qline_at] = out[qline_at] + ' rowsort'
            if i < len(lines) and lines[i].strip() == '----':
                out.append('----'); i += 1
                while i < len(lines) and lines[i].strip() != '':
                    row = lines[i].strip()
                    toks = row.split()
                    if len(toks) > ncols:
                        # re-join timestamp values split on the date/time
                        # boundary ('2022-01-01' '02:00:11.000000')
                        merged, j = [], 0
                        while j < len(toks):
                            if (j + 1 < len(toks)
                                    and re.fullmatch(r'\d{4}-\d{2}-\d{2}', toks[j])
                                    and re.fullmatch(r'\d{2}:\d{2}:\d{2}(\.\d+)?', toks[j + 1])):
                                merged.append(toks[j] + ' ' + toks[j + 1]); j += 2
                            else:
                                merged.append(toks[j]); j += 1
                        toks = merged
                    if len(toks) > ncols:
                        # re-join values split inside parens:
                        # 'DECIMAL(15, 3)', 'TUPLE(1 INT32, 2 INT32)'
                        merged, buf, depth = [], [], 0
                        for t in toks:
                            buf.append(t)
                            depth += t.count('(') - t.count(')')
                            if depth <= 0:
                                merged.append(' '.join(buf)); buf, depth = [], 0
                        if buf:
                            merged.append(' '.join(buf))
                        toks = merged
                    if ncols == 1 and len(toks) > 1:
                        # single column whose value contains spaces
                        # (timestamps, sentences): the whole row is the cell
                        toks = [row]
                    if len(toks) == ncols:
                        cells = []
                        for t, ty in zip(toks, types):
                            if ty == 'B' and t in ('0', '1'):
                                t = 'false' if t == '0' else 'true'
                            if ty == 'R' and re.fullmatch(r'-?\d+\.\d+', t):
                                t = fmt_double(t)
                            # keep '(empty)' as-is: the runner
                            # normalizes it to '' at compare time, and a
                            # bare empty line would end the block
                            cells.append(t)
                        out.append('\t'.join(cells))
                    else:
                        out.append(row + '\t# PORT-CHECK cols=%d got=%d' % (ncols, len(toks)))
                    i += 1
            continue
        out.append(line)
        i += 1
    return '\n'.join(out) + '\n'


if __name__ == '__main__':
    sys.stdout.write(convert(sys.argv[1]))
