"""Extract published empirical amino-acid replacement matrices (numeric
data tables: Dayhoff72, JTT92, WAG01, LG08, ...) from the reference's data
files into a Python module, reordered to our canonical AA order.

These are published scientific constants (each class cites its paper);
only numbers are extracted, no code.
"""
import re
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/reference/src/dr/evomodel/substmodel/aminoacid"
OUR_ORDER = "ACDEFGHIKLMNPQRSTVWY"

models = {}
for fname in sorted(os.listdir(SRC)):
    if not fname.endswith(".java") or fname in (
        "AminoAcidModelType.java", "EmpiricalAminoAcidModel.java"):
        continue
    name = fname[:-5]
    text = open(os.path.join(SRC, fname)).read()
    rates = {}
    for m in re.finditer(r"rate\[(\d+)\]\[(\d+)\]\s*=\s*([0-9.eE+-]+)", text):
        rates[(int(m.group(1)), int(m.group(2)))] = float(m.group(3))
    freqs = {}
    for m in re.finditer(r"f\[(\d+)\]\s*=\s*([0-9.eE+-]+)", text):
        freqs[int(m.group(1))] = float(m.group(2))
    orders = re.findall(r'setEmpiricalRates\(rate,\s*"([A-Z]+)"', text)
    forders = re.findall(r'setEmpiricalFrequencies\(f,\s*"([A-Z]+)"', text)
    if not rates or not freqs or not orders:
        print(f"skip {name}: rates={len(rates)} freqs={len(freqs)} orders={orders}")
        continue
    src_order = orders[0]
    fsrc_order = forders[0] if forders else src_order
    n = 20
    # reorder to OUR_ORDER, mimicking setEmpiricalRates
    tri = []
    for i in range(n):
        u = src_order.index(OUR_ORDER[i])
        for j in range(i + 1, n):
            v = src_order.index(OUR_ORDER[j])
            key = (u, v) if u < v else (v, u)
            tri.append(rates.get(key, 0.0))
    fr = [freqs[fsrc_order.index(c)] for c in OUR_ORDER]
    s = sum(fr)
    fr = [x / s for x in fr]
    models[name] = (tri, fr)
    print(f"extracted {name}: {len(tri)} rates, freq sum normalized")

with open("beast_mcmc_tpu/models/data/aa_matrices.py", "w") as out:
    out.write('"""Empirical amino-acid replacement model data.\n\n')
    out.write("Published rate/frequency tables (Dayhoff 1972; Jones/Taylor/\n")
    out.write("Thornton 1992; Whelan & Goldman 2001 WAG; Le & Gascuel 2008 LG;\n")
    out.write("Henikoff Blosum62; mtREV/mtMAM/mtVER/... mitochondrial models;\n")
    out.write("cpREV chloroplast; FLU), numeric data extracted from the\n")
    out.write("reference's data tables (ref: src/dr/evomodel/substmodel/\n")
    out.write('aminoacid/*.java) and reordered to the canonical order\n')
    out.write(f'{OUR_ORDER!r} (upper-triangle row-major exchangeabilities).\n"""\n\n')
    out.write(f"AA_ORDER = {OUR_ORDER!r}\n\nAA_MODELS = {{\n")
    for name, (tri, fr) in sorted(models.items()):
        out.write(f"  {name.upper()!r}: {{\n    'rates': [\n")
        for i in range(0, len(tri), 6):
            out.write("      " + ", ".join(f"{x!r}" for x in tri[i:i+6]) + ",\n")
        out.write("    ],\n    'frequencies': [\n")
        for i in range(0, len(fr), 5):
            out.write("      " + ", ".join(f"{x!r}" for x in fr[i:i+5]) + ",\n")
        out.write("    ],\n  },\n")
    out.write("}\n")
print("written", len(models), "models")
