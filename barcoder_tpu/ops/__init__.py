from .types import Hits, STRAND_F, STRAND_R
from .scan import scan_contig, scan_genome, resolve_backend
