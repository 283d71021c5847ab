"""Sequence file importers (role of dr.evolution.io.*Importer).

FASTA (ref: src/dr/evolution/io/FastaImporter.java) and a pragmatic NEXUS
subset (ref: NexusImporter.java): DATA/CHARACTERS matrix and TREES block,
which covers the reference's example/test corpora.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from beast_mcmc_tpu.data.alignment import Alignment
from beast_mcmc_tpu.data.datatype import AMINO_ACIDS, NUCLEOTIDES, DataType


def read_fasta(text: str, datatype: DataType = NUCLEOTIDES) -> Alignment:
    taxa: List[str] = []
    seqs: List[str] = []
    cur: List[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            if taxa:
                seqs.append("".join(cur))
            taxa.append(line[1:].split()[0])
            cur = []
        else:
            cur.append(line)
    if taxa:
        seqs.append("".join(cur))
    return Alignment.from_sequences(taxa, seqs, datatype)


def write_fasta(alignment: Alignment) -> str:
    lines = []
    for i, t in enumerate(alignment.taxa):
        lines.append(f">{t}")
        lines.append(alignment.datatype.decode(alignment.states[i]))
    return "\n".join(lines) + "\n"


_NEXUS_DT = {"DNA": NUCLEOTIDES, "RNA": NUCLEOTIDES, "NUCLEOTIDE": NUCLEOTIDES,
             "PROTEIN": AMINO_ACIDS}


def read_nexus(text: str) -> Tuple[Optional[Alignment], Dict[str, str]]:
    """Parse a NEXUS file. Returns (alignment|None, {tree_name: newick}).

    Handles DATA/CHARACTERS blocks (FORMAT DATATYPE=..., MATRIX) and TREES
    blocks with TRANSLATE tables.
    """
    # strip comments
    text = re.sub(r"\[[^\]]*\]", "", text)
    body = re.sub(r"^\s*#NEXUS", "", text, flags=re.I)
    blocks = re.findall(r"BEGIN\s+(\w+)\s*;(.*?)END\s*;", body, re.S | re.I)
    alignment = None
    trees: Dict[str, str] = {}
    for name, content in blocks:
        name = name.upper()
        if name in ("DATA", "CHARACTERS"):
            alignment = _parse_matrix_block(content)
        elif name == "TREES":
            trees.update(_parse_trees_block(content))
    return alignment, trees


def _parse_matrix_block(content: str) -> Alignment:
    dt = NUCLEOTIDES
    m = re.search(r"DATATYPE\s*=\s*(\w+)", content, re.I)
    if m:
        dt = _NEXUS_DT.get(m.group(1).upper(), NUCLEOTIDES)
    mm = re.search(r"MATRIX(.*?);", content, re.S | re.I)
    if not mm:
        raise ValueError("NEXUS DATA block without MATRIX")
    taxa: List[str] = []
    seqs: Dict[str, List[str]] = {}
    for line in mm.group(1).splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split(None, 1)
        if len(parts) != 2:
            continue
        name, seq = parts
        name = name.strip("'\"")
        if name not in seqs:
            taxa.append(name)
            seqs[name] = []
        seqs[name].append(re.sub(r"\s", "", seq))
    return Alignment.from_sequences(taxa, ["".join(seqs[t]) for t in taxa], dt)


def _parse_trees_block(content: str) -> Dict[str, str]:
    translate: Dict[str, str] = {}
    tm = re.search(r"TRANSLATE(.*?);", content, re.S | re.I)
    if tm:
        for entry in tm.group(1).split(","):
            parts = entry.split()
            if len(parts) >= 2:
                translate[parts[0]] = parts[1].strip("'\",")
    trees: Dict[str, str] = {}
    for m in re.finditer(r"TREE\s+\*?\s*(\S+)\s*=\s*(?:\[&[A-Za-z]\])?\s*([^;]+);",
                         content, re.I):
        name, newick = m.group(1), m.group(2).strip() + ";"
        if translate:
            newick = re.sub(
                r"(?<=[(,])\s*([^\s(),:\[\]]+)",
                lambda mm: translate.get(mm.group(1), mm.group(1)),
                newick,
            )
        trees[name] = newick
    return trees
