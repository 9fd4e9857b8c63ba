"""Gene model: transcript -> gene mapping (reference: src/GeneModel.{h,cpp}).

Round 1 implements the t2g path (parseGeneMap, GeneModel.cpp:580-632);
GTF parsing (parseGTF) lands with the genomebam milestone.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Sequence

import numpy as np


@dataclass
class GeneMap:
    gene_names: List[str] = field(default_factory=list)      # first-seen order
    gene_common: List[str] = field(default_factory=list)
    tx_gene: np.ndarray = None   # [T] int32 gene id, -1 if unmapped

    @property
    def num_genes(self) -> int:
        return len(self.gene_names)


def parse_gene_map(path: str, target_names: Sequence[str]) -> GeneMap:
    """t2g file: `transcript<ws>gene_id[<ws>gene_common_name]` per line.

    Genes are numbered in first-appearance order
    (reference: Transcriptome::parseGeneMap, GeneModel.cpp:580-632).
    """
    tr_to_id: Dict[str, int] = {n: i for i, n in enumerate(target_names)}
    gm = GeneMap(tx_gene=np.full(len(target_names), -1, np.int32))
    gene_ids: Dict[str, int] = {}
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            parts = line.split()
            txp = parts[0]
            if len(parts) < 2:
                raise ValueError(f"no gene associated with transcript {txp} in {path}")
            gene = parts[1]
            common = parts[2] if len(parts) > 2 else ""
            tid = tr_to_id.get(txp)
            if tid is None:
                raise ValueError(f"invalid transcript: {txp} in {path}")
            gid = gene_ids.get(gene)
            if gid is None:
                gid = len(gm.gene_names)
                gene_ids[gene] = gid
                gm.gene_names.append(gene)
                gm.gene_common.append(common)
            gm.tx_gene[tid] = gid
    return gm


def rollup_to_genes(values: np.ndarray, tx_gene: np.ndarray, num_genes: int) -> np.ndarray:
    """Sum transcript-level values into genes (only alpha > 0 contributes,
    matching plaintext_writer_gene, PlaintextWriter.cpp:89-97 -- identical
    result since zeros add nothing)."""
    mask = tx_gene >= 0
    out = np.zeros(num_genes, np.float64)
    np.add.at(out, tx_gene[mask], values[mask])
    return out
