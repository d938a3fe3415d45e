"""High-level class API — the framework's equivalent of the reference's
SOLID-style layer (GenBankParser / GuideFinder / BowtieRunner / PySamParser /
PAMFinder / CRISPRiLibrary demonstrated in testing_grounds.py:16-43).

The flow maps 1:1:

    reference                           barcoder_tpu
    ---------                           ------------
    GenBankParser("g.gb")               Genome.load("g.gb")
    GuideFinder(...).find_guides...     GuideFinder(genome, pam, dir, len)
    BarCodeLibrary(barcodes=guides)     BarcodeLibrary.from_list(guides)
    with BowtieRunner() as bt: ...      ScanRunner(genome).align(barcodes, v)
    PySamParser(sam).ranges             ...returns the same interval frame
    ranges.join(genbank.ranges)         ScanRunner.align(..., join_features=True)
    CRISPRiLibrary(df, pam_finder)      CRISPRiLibrary(df, pam_finder)

Differences: alignment runs on the device scan engine instead of a Bowtie
subprocess + SAM round-trip, and the interval join is a vectorized
searchsorted join instead of PyRanges.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .core.encode import revcomp
from .core.genome import Genome
from .ops.scan import scan_contig
from .ops.types import STRAND_R
from .seqio.library import BarcodeLibrary  # re-export for API parity
from .utils.logger import Logger

__all__ = ["Genome", "BarcodeLibrary", "GuideFinder", "PAMFinder", "ScanRunner", "CRISPRiLibrary"]


class GuideFinder:
    """Find guide sequences adjacent to PAM matches
    (reference: PAMProcessor.py:27-57)."""

    def __init__(self, genome: Genome, pam: str, direction: str, length: int):
        self.genome = genome
        self.pam = pam.replace("N", "[ATCG]")
        self.direction = direction
        self.length = length

    def find_guides_from_pam(self) -> list[str]:
        """Regex-driven enumeration, faithful to the reference: for each
        strand string, guides upstream of PAM matches (direction
        'downstream' → the guide precedes the PAM)."""
        guides: list[str] = []
        pat = re.compile(self.pam)
        for contig in self.genome.contigs:
            for seq in (contig.seq, revcomp(contig.seq)):
                for match in pat.finditer(seq):
                    start, end = match.start(), match.end()
                    if self.direction == "downstream":
                        g = seq[max(0, start - self.length) : start]
                    elif self.direction == "upstream":
                        g = seq[end : min(end + self.length, len(seq))]
                    else:
                        raise ValueError("Direction must be 'upstream' or 'downstream'")
                    guides.append(g)
        return guides


class PAMFinder:
    """Row-wise PAM extraction + matching over interval frames
    (reference: PAMProcessor.py:60-97)."""

    def __init__(self, genome: Genome, pam: str, direction: str):
        self.genome = genome
        self.pam = pam.replace("N", "[ATCG]")
        self.pam_length = len(pam)
        self.direction = direction
        self._by_id = {c.id: c for c in genome.contigs}

    def get_pam_seq(self, row) -> str:
        contig = self._by_id[row.Chromosome]
        strand = 1 if str(row.Strand) in ("+", "1", "+1") else -1
        if strand == 1:
            window = contig.seq[row.End : row.End + self.pam_length]
        else:
            window = contig.seq[max(0, row.Start - self.pam_length) : row.Start]
        if strand == -1:
            window = revcomp(window)
        return window

    def pam_matches(self, sequence: str) -> bool:
        return bool(re.search(self.pam, sequence))


class ScanRunner(Logger):
    """Alignment engine with the BowtieRunner role (BowtieRunner.py:13-150):
    align a barcode set against the genome at <= v mismatches and return the
    reference's interval-frame schema (PySamParser.py:21-52) —
    Chromosome/Start/End/Mapped/Strand/Barcode/Mismatches — optionally
    joined with the genome's feature intervals (the
    ``sam.ranges.join(genbank.ranges)`` step, testing_grounds.py:38)."""

    def __init__(self, genome: Genome, backend: str = "auto"):
        super().__init__()
        self.genome = genome
        self.backend = backend

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def align(
        self,
        barcodes,
        num_mismatches: int = 0,
        pam: str = "",
        pam_direction: str = "downstream",
        join_features: bool = False,
    ) -> pd.DataFrame:
        seqs = sorted(set(barcodes)) if not isinstance(barcodes, list) else list(dict.fromkeys(barcodes))
        by_len: dict[int, list[str]] = {}
        for s in seqs:
            by_len.setdefault(len(s), []).append(s)
        rows = []
        mapped_seqs = set()
        for L, group in sorted(by_len.items()):
            for contig in self.genome.contigs:
                hits = scan_contig(group, contig, num_mismatches, pam, pam_direction, self.backend)
                for i in range(len(hits)):
                    seq = group[int(hits.spacer_idx[i])]
                    p = int(hits.pos[i])
                    rows.append(
                        {
                            "Chromosome": contig.id,
                            "Start": p,
                            "End": p + L,
                            "Mapped": True,
                            "Strand": "-" if hits.strand[i] == STRAND_R else "+",
                            "Barcode": seq,
                            "Mismatches": int(hits.mismatches[i]),
                        }
                    )
                    mapped_seqs.add(seq)
        for seq in seqs:
            if seq not in mapped_seqs:
                rows.append(
                    {
                        "Chromosome": None,
                        "Start": -1,
                        "End": -1,
                        "Mapped": False,
                        "Strand": ".",
                        "Barcode": seq,
                        "Mismatches": 0,
                    }
                )
        df = pd.DataFrame(rows)
        if join_features:
            df = self.join_features(df)
        return df

    def feature_frame(self) -> pd.DataFrame:
        """Genome features as an interval frame
        (reference: GenBankParser.ranges, GenBankParser.py:68-103 — source +
        gene features, one row per location part)."""
        data = []
        for contig in self.genome.contigs:
            data.append(
                {
                    "Chromosome": contig.id,
                    "Start": 0,
                    "End": contig.length,
                    "Strand": "+",
                    "Locus_Tag": None,
                    "Gene": None,
                    "Type": "source",
                }
            )
            for feat in contig.features:
                if feat.type not in ("source", "gene"):
                    continue
                if feat.type == "source":
                    continue  # synthesized above from contig bounds
                for part in feat.location.parts:
                    data.append(
                        {
                            "Chromosome": contig.id,
                            "Start": int(part.start),
                            "End": int(part.end),
                            "Strand": "+" if part.strand == 1 else "-" if part.strand == -1 else ".",
                            "Locus_Tag": feat.qualifier("locus_tag"),
                            "Gene": feat.qualifier("gene"),
                            "Type": feat.type,
                        }
                    )
        return pd.DataFrame(data)

    def join_features(self, align_df: pd.DataFrame) -> pd.DataFrame:
        """Interval join of alignments × features (PyRanges .join
        equivalent): one output row per overlapping pair, feature columns
        suffixed _b like PyRanges does."""
        feats = self.feature_frame()
        out = []
        for chrom, adf in align_df[align_df.Mapped].groupby("Chromosome"):
            fdf = feats[feats.Chromosome == chrom].reset_index(drop=True)
            if not len(fdf):
                continue
            starts = fdf.Start.to_numpy()
            ends = fdf.End.to_numpy()
            order = np.argsort(starts, kind="stable")
            s_sorted = starts[order]
            max_len = int((ends - starts).max())
            a = adf.Start.to_numpy()
            b = adf.End.to_numpy()
            lo = np.searchsorted(s_sorted, a - max_len)
            hi = np.searchsorted(s_sorted, b)
            for row_i, (l, h) in enumerate(zip(lo, hi)):
                for k in range(l, h):
                    fi = order[k]
                    if starts[fi] < b[row_i] and ends[fi] > a[row_i]:
                        rec = adf.iloc[row_i].to_dict()
                        frow = fdf.iloc[fi]
                        rec.update(
                            {
                                "Start_b": int(frow.Start),
                                "End_b": int(frow.End),
                                "Strand_b": frow.Strand,
                                "Locus_Tag": frow.Locus_Tag,
                                "Gene": frow.Gene,
                                "Type": frow.Type,
                            }
                        )
                        out.append(rec)
        return pd.DataFrame(out)


class CRISPRiLibrary:
    """Guide-library filters over the joined frame
    (reference: CRISPRiLibrary.py:4-120)."""

    def __init__(self, targets_df: pd.DataFrame, pam_finder: PAMFinder):
        self.targets_df = targets_df.copy()
        self.pam_finder = pam_finder
        self._annotate_targets()
        self.source_unique_targets = self._get_source_unique_targets()
        self.mapped_targets = self._get_mapped_targets()
        self.unique_targets = self._get_unique_targets()
        self.unambiguous_targets = self._get_unambiguous_targets()

    def _annotate_targets(self):
        self.targets_df["PAM"] = self.targets_df.apply(
            lambda row: self.pam_finder.get_pam_seq(row), axis=1
        )
        self.targets_df["Targeting"] = self.targets_df["PAM"].apply(
            lambda x: self.pam_finder.pam_matches(x)
        )

    def _get_source_unique_targets(self):
        """Targets unique at the chromosome level (CRISPRiLibrary.py:23-45)."""
        return (
            self.targets_df[
                (self.targets_df["Type"] == "source")
                & (self.targets_df["Targeting"] == True)  # noqa: E712
                & (self.targets_df["Mapped"] == True)  # noqa: E712
            ]
            .loc[lambda df: ~df.duplicated(subset=["Barcode"])]
            .reset_index(drop=True)
        )

    def _get_mapped_targets(self):
        """Feature-mapped targets with Offset/Overlap
        (CRISPRiLibrary.py:47-83)."""
        return (
            self.targets_df[
                (self.targets_df["Type"] != "source")
                & (self.targets_df["Targeting"] == True)  # noqa: E712
                & (self.targets_df["Mapped"] == True)  # noqa: E712
            ]
            .assign(
                Offset=lambda df: df.apply(
                    lambda row: {
                        "+": row.Start - row.Start_b,
                        "-": row.End_b - row.End,
                    }.get(row.Strand_b, None),
                    axis=1,
                ),
                Overlap=lambda df: df.apply(
                    lambda row: max(min(row.End, row.End_b) - max(row.Start, row.Start_b), 0),
                    axis=1,
                ),
            )
            .reset_index(drop=True)
        )

    def _get_unique_targets(self):
        mapped = self._get_mapped_targets()
        return (
            mapped[mapped["Barcode"].isin(self.source_unique_targets.Barcode)]
            .sort_values(["Chromosome", "Start", "End"])
            .reset_index(drop=True)
        )

    def _get_unambiguous_targets(self):
        return self.unique_targets[
            ~self.unique_targets.duplicated(subset=["Barcode"]).reset_index(drop=True)
        ]
