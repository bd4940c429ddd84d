#!/usr/bin/env python3
"""Repo-root driver: all-pairs node-embedding alignments.

Equivalent of the reference's run_all_pairwise_alignments.py (which is
bit-rotted — it passes flags the pairwise CLI does not accept, see
SURVEY.md §7.4).  This version simply drives the batched all-pairs
aligner, which runs whole batches of pairs per device program instead of
spawning one subprocess per pair.

Usage:
  python run_all_pairwise_alignments.py --input nodes.tsv \
      --id-column rnacentral_id --output-dir out/ [--mode global] ...
"""

import sys

from ginfinity_tpu.pipelines.align_batch import main

if __name__ == "__main__":
    main(sys.argv[1:] + (["--write-alignment"] if "--write-alignment" not in sys.argv else []))
