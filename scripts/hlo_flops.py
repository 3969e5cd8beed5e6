"""FLOPs attribution for compiled HLO text: map every executable kernel
(fusion / dot / convolution) to the MXU FLOPs of the dot and convolution
instructions it contains, so a device trace's per-kernel ms can be turned
into per-kernel (and per-category) TFLOP/s.

Why: the step traces bin kernels by name/op_name only; a bin's share of
step time says nothing about whether it is FAST. The UNet step carries
~10 TFLOP of plain GEMMs (FF/projections — as much as its convolutions), and
only a FLOPs column can show which families run far from the MXU roofline.

HLO in this JAX version names operands without inline shapes
(``dot(%a, %b)``), so we build a per-computation symbol table of
``%name = dtype[dims]`` definitions first and resolve operand shapes
through it (fusion-body parameters shadow entry-computation names).

Used by scripts/trace_unet.py --flops; standalone:
  python scripts/hlo_flops.py dumped.hlo.txt
"""

import re
import sys
from collections import defaultdict

_DEF_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\(?([a-z0-9]+)\[([\d,]*)\]")
_OPS_RE = re.compile(r"\(\s*%?([\w.\-]+)(?:\s*,\s*%?([\w.\-]+))?")
_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")
_WINDOW_RE = re.compile(r"window=\{([^}]*)\}")
_DIMLBL_RE = re.compile(r"dim_labels=(\w+)_(\w+)->(\w+)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")
_COMP_START_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)(?:\.clone)?\s*"
                            r"(?:\([^)]*\))?\s*->")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def _dims(s):
    return [int(d) for d in s.split(",") if d] if s else []


def _prod(ds):
    p = 1
    for d in ds:
        p *= d
    return p


def _flops(line, shapes_local, shapes_global, out_dims):
    """FLOPs of one dot/convolution instruction line."""
    def shape_of(name):
        return shapes_local.get(name) or shapes_global.get(name)

    kind = "dot" if re.search(r"\sdot\(", line) else "conv"
    tail = line.split(" dot(", 1)[-1] if kind == "dot" \
        else line.split(" convolution(", 1)[-1]
    om = _OPS_RE.match("(" + tail)
    if not om:
        return 0.0
    lhs_name, rhs_name = om.group(1), om.group(2)
    out_elems = _prod(out_dims)
    if kind == "dot":
        lhs = shape_of(lhs_name)
        if lhs is None:
            return 0.0
        cm = _CONTRACT_RE.search(line)
        contracted = 1
        for d in (_dims(cm.group(1)) if cm else []):
            if d < len(lhs):
                contracted *= lhs[d]
        return 2.0 * out_elems * contracted
    # convolution
    window = 1
    wm = _WINDOW_RE.search(line)
    if wm:
        sm = re.search(r"size=([\dx]+)", wm.group(1))
        if sm:
            for d in sm.group(1).split("x"):
                window *= int(d)
    rhs = shape_of(rhs_name) if rhs_name else None
    dl = _DIMLBL_RE.search(line)
    cin = 0
    if rhs and dl:
        i_pos = dl.group(2).find("i")
        if 0 <= i_pos < len(rhs):
            cin = rhs[i_pos]
    groups = int(_FGC_RE.search(line).group(1)) if _FGC_RE.search(line) else 1
    return 2.0 * out_elems * window * cin / max(groups, 1)


def kernel_flops(hlo_text: str):
    """-> {top_level_instruction_name: flops}. Fusions resolve to the sum of
    dot/conv FLOPs inside their called computation; bare dot/convolution
    instructions keep their own."""
    lines = hlo_text.splitlines()

    # pass 1: symbol tables + per-computation dot/conv FLOPs
    shapes_global = {}
    comp_of_line = [None] * len(lines)
    comp = None
    comp_shapes = defaultdict(dict)
    for i, line in enumerate(lines):
        if line.startswith("}"):
            comp = None
            continue
        if not line.startswith((" ", "\t")) and ("->" in line or
                                                 line.startswith("ENTRY")):
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)", line)
            if m and "{" in line:
                comp = m.group(1)
                continue
        comp_of_line[i] = comp
        m = _DEF_RE.match(line)
        if m:
            name, dims = m.group(1), _dims(m.group(3))
            if comp:
                comp_shapes[comp][name] = dims
            shapes_global.setdefault(name, dims)

    comp_flops = defaultdict(float)
    top_level = {}   # name -> (kind, line_index) in the entry computation
    for i, line in enumerate(lines):
        if " dot(" not in line and " convolution(" not in line \
                and " fusion(" not in line:
            continue
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, out_dims = m.group(1), _dims(m.group(3))
        comp = comp_of_line[i]
        local = comp_shapes.get(comp, {})
        if " fusion(" in line:
            cm = _CALLS_RE.search(line)
            if cm:
                top_level.setdefault(name, []).append(("fusion", cm.group(1)))
            continue
        f = _flops(line, local, shapes_global, out_dims)
        if comp:
            comp_flops[comp] += f
        top_level.setdefault(name, []).append(("direct", f))

    out = {}
    for name, items in top_level.items():
        tot = 0.0
        for kind, v in items:
            tot += comp_flops.get(v, 0.0) if kind == "fusion" else v
        if tot:
            out[name] = tot
    return out


def main():
    with open(sys.argv[1]) as f:
        text = f.read()
    kf = kernel_flops(text)
    total = sum(kf.values())
    print(f"{len(kf)} kernels with MXU flops, total {total/1e12:.3f} TFLOP")
    for name, fl in sorted(kf.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {fl/1e9:10.2f} GF  {name}")


if __name__ == "__main__":
    main()
