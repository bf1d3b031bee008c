"""Run parameters and mode enums.

Behavioral parity with the reference CLI surface: modes and defaults follow
/root/reference/fqs/params.h:16-78 and the genome-size -> k-mer-length tuning
table params.h:131-155. The archive stores a serialized params blob so
decompression needs no flags (params.h:80-129); our blob format is our own.
"""
from __future__ import annotations

import dataclasses
import enum
import json
from typing import List, Optional


class WorkMode(enum.Enum):
    COMPRESS = "compress"
    DECOMPRESS = "decompress"


class DnaMode(enum.Enum):
    SE_ORIGINAL = "se_original"
    SE_SORTED = "se_sorted"
    PE_ORIGINAL = "pe_original"
    PE_SORTED = "pe_sorted"


class IdMode(enum.Enum):
    LOSSLESS = "lossless"
    INSTRUMENT = "instrument"
    NONE = "none"


class QualityMode(enum.Enum):
    LOSSLESS = "lossless"
    ILLUMINA_8 = "illumina_8"
    ILLUMINA_4 = "illumina_4"
    BINARY = "binary"
    NONE = "none"


# Genome size (Mbp) thresholds -> (prefix_len, pmer_len, smer_len, bmer_len).
# Parity with /root/reference/fqs/params.h:131-155 (imer column dropped: it is
# vestigial in the reference — stored but never used, see SURVEY.md §2).
_KMER_TUNING = (
    (1, 9, 14, 17, 19),
    (4, 9, 15, 18, 20),
    (16, 10, 15, 18, 21),
    (64, 11, 16, 18, 23),
    (256, 12, 17, 20, 24),
    (1024, 12, 17, 21, 26),
    (4096, 13, 18, 21, 27),
    (16384, 14, 18, 22, 27),
    (65536, 15, 18, 22, 27),
)

# Dense SIV memory cap: the SIV is a dense uint8[4^siv_len] per-next-base
# counter array, so siv_len is capped independently of pmer_len (the reference
# packs 2-bit counters instead, bit_vec.h:29-40). 14 = 268 MB packed plane;
# measured best ratio (see Params.dna_siv_cap). Decode-affecting: the
# effective cap rides the archive header (dna_siv_cap, legacy 13).
_SIV_LEN_CAP = 14


@dataclasses.dataclass
class Params:
    work_mode: WorkMode = WorkMode.COMPRESS
    file_names: List[str] = dataclasses.field(default_factory=list)
    tmp_path: str = "./fqs_tmp_"
    out_path: str = "output.fqst"
    out_path2: str = "output2.fqst"

    no_threads: int = 1  # maps to device/lane hint, kept for CLI parity
    genome_size: int = 3100  # Mbp, like reference -gs

    dna_mode: DnaMode = DnaMode.SE_SORTED
    id_mode: IdMode = IdMode.INSTRUMENT
    quality_mode: QualityMode = QualityMode.ILLUMINA_8
    quality_thr: int = 20
    duplicates_check: bool = True
    verbosity: int = 1

    # k-mer geometry (auto-tuned from genome_size unless set explicitly)
    prefix_len: int = 14
    pmer_len: int = 13
    smer_len: int = 15
    bmer_len: int = 26

    # id geometry (set at compress time from the data; stored in the header)
    max_id_len: int = 64
    id_n_fields: int = 4   # numeric token fields per id (see streams/ids.py)
    id_codec_v: int = 2    # id stream codec version (see ids.IdConfig)

    # TPU execution geometry
    mesh_dp: int = 1               # data-parallel shards the archive was written with
    mesh_tp: int = 1               # table shards (decode needs the same mesh)
    n_lanes: int = 1024            # interleaved rANS lanes per batch (per dp shard)
    max_batch_reads: int = 4096    # reads per device step (sync interval);
    # smaller = fresher tables = better ratio (state cost amortized by groups)
    scale_bits: int = 14           # rANS probability resolution

    # table capacities (log2 of bucket counts); presized like the reference
    # presizes from -gs (params.h:131-155) instead of growing mid-stream
    smer_log2_buckets: int = 20
    bmer_log2_buckets: int = 20
    pe_log2_buckets: int = 18
    # in-batch local table cells (reference ht_*_local analog); 0 disables
    local_log2_cells: int = 22
    # in-batch model-delta increment (row-synced model adaptation); 0 = off.
    # Measured on the standard corpus: deltas HURT (count-conditioned
    # contexts are already well-estimated; in-batch deltas add sampling
    # noise): DNA 1,559,442 (inc 0) vs 1,578,800 (inc 8) at batch 4096.
    local_model_inc: int = 0
    # two-level model mix (streams/dna.py _dna_cdf): coarse pseudo-count
    # budget for young fine contexts (0 = off) and its fade constant.
    # Swept on the standard corpus (DNA bytes): off 1,559,374; 32:64
    # 1,549,356; 256:256 1,540,204; 2048:2048 1,535,066; 2048:4096
    # 1,535,048 (best); 8000:8000 1,537,462. Flat-ish weights win — fine
    # count-profile contexts stay noisy even when mature here.
    dna_mix_w: int = 2048
    dna_mix_b: int = 4096
    # sorted-mode LCP-distance position bucket (dna._pos_bucket_sorted).
    # Measured WORSE on the se_sorted corpus (DNA 1,415,710 vs 1,409,006
    # with the absolute-position bucket) — kept off; the knob stays for
    # real-data re-evaluation.
    dna_sorted_ctx: int = 0
    # throughput/ratio knobs (decode-affecting, stored in the header):
    # greedy repair iterations; global-table claim rounds per update;
    # whether local tables also ingest the reverse-complement strand
    # round-3 defaults (TPU sweep, standard corpus): repair 3->1 iters
    # (+3.2 KB = +0.09%, +9% speed at iters 2->1), fused table updates
    # (claim_rounds 0) +762 B, 2-pass local inserts (local_lite) +46 B —
    # together ~+0.2% size for ~+60% compress throughput (7,109 -> 11,501
    # reads/s at that point in the round). Knobs stay in the header, so
    # ratio-first users can set -repair 3 etc. and decode follows.
    dna_repair_iters: int = 1
    dna_claim_rounds: int = 0
    dna_local_rc: int = 1
    # 2-pass local inserts (tables.local_insert lite=True: no ownership
    # gather; deterministic collision pollution). Decode-affecting.
    dna_local_lite: int = 1
    # pmer-level position gate (streams/dna.py DnaConfig.pmer_gate): SIV
    # evidence enters the cascade only at positions < gate; 0 = ungated.
    # Measured a net LOSS on the standard corpus (see the DnaConfig
    # comment) — kept for real-data re-evaluation, default off.
    dna_pmer_gate: int = 0
    # read-prefix partial-SIV ramp (streams/dna.py DnaConfig.prefix_ramp):
    # positions [prefix_len, siv_len-2] take cascade counts from SIV range
    # sums instead of coding pure letters. Single-chip paths only (the mesh
    # shards the SIV); decode-affecting, in the header. Standard corpus:
    # DNA 1,523,382 -> 1,512,324 (-0.7%).
    dna_prefix_ramp: int = 1
    # effective dense-SIV length cap (decode-affecting, in the header:
    # older archives were written at 13). 14 measured best on the standard
    # corpus (DNA bytes: cap 13 → 1,535,058; 14 → 1,523,382; 15 →
    # 1,526,960 — longer contexts thin out repeat coverage faster than
    # they remove dense-array aliases).
    dna_siv_cap: int = _SIV_LEN_CAP
    # canonical-strand s/b-mer tables (ops/tables.py ktable_*): cells keyed
    # by the canonical FULL k-mer (reference kernel canonicalization,
    # kmer.h:199-207) — one insert event per occurrence covers both strands,
    # halving the table-update scatter traffic. Decode-affecting (cell
    # layout + statistics); legacy archives decode with 0.
    dna_canon: int = 1
    # DNA code-context layout version (streams/dna.py _code_ctx): v2 adds
    # a previous-position cascade-level class (2 bits) and a causal
    # repair-recency zone (2 bits, the reference's cor_zone analog,
    # dna.cpp:741) to the fine context. Measured on the DNA-only SE corpus
    # (offline oracle/sequential pricing of the dumped (ctx, sym) stream):
    # current 202.5 KB -> +prevclass+cz 187.9 KB. Decode-affecting;
    # legacy archives decode with 1.
    dna_ctx_v: int = 2
    # PE-aware position contexts for the anchored 3-row recoding
    # (streams/dna.py DnaConfig.pe_pos_ctx): rowA positions use the TRUE
    # read2 coordinate (anchor start + i, reference compress_suffix start
    # position, dna.cpp:1595), rowB the reversed-part convention (position
    # counted back toward read2's start with no end-of-read flag,
    # determine_ctx_codes(size - i - 1, ..., ~0u), dna.cpp:745-755).
    # Measured RATIO-NEUTRAL on the 50k-pair bench corpus (uniform 100bp
    # reads): 1,504,751 B with vs 1,504,594 without (+157 B). Kept as an
    # archive-header knob for variable-length real data; default off.
    # Decode-affecting; legacy archives decode with 0.
    dna_pe_pos_ctx: int = 0
    # suspect-tracked 1-substitution s-mer miss evidence (round 5; see
    # streams/dna.py DnaConfig.rough — the O(4)-finds answer to the
    # reference's find_counts_rough_s, dna.cpp:257-292). Offline pricing:
    # -68.5 KB DNA on the standard corpus (88% of the attributed pmer-level
    # gap), 98.3% rank-0 among rescued positions (tools/study_rough.py).
    # Decode-affecting; applies only with row_global + canon + ctx_v >= 2
    # (gated in make_configs); legacy archives decode with 0.
    dna_rough: int = 1
    # s/b table update protocol: 1 = K2 single-word cells, updates are one
    # gather + one scatter-max (tables.k2_update; scatters measured 5-8x a
    # gather per event — the 3-pass u16 protocol's two scatter passes were
    # the largest block of both the encode row pass and the decode scan).
    # Same-call duplicate occurrences collapse to +1 (deterministic,
    # probabilistic-counter-flavored like the reference's utils.h:256-335).
    # Decode-affecting; legacy archives decode with 0.
    dna_sb_proto: int = 1
    # coarse letters-branch position bucket (streams/dna.py
    # DnaConfig.let_pb2): letters contexts keep pb>>2 (4 classes) instead
    # of the 16-bucket pb — fewer contexts mature faster. Offline Laplace
    # pricing said -11.5 KB std / -9.8 KB realistic (tools/study_letters.py)
    # but the on-codec win is only -688 B on the standard DNA-only corpus:
    # the two-level mix (dna_mix_w) already absorbs most young-context
    # cost. Kept on (small, free, one-directional); the same study
    # REJECTED deeper letters histories outright (order-6/7/9 all price
    # worse — context thinning dominates). Decode-affecting; legacy
    # archives decode with 0.
    dna_let_pb2: int = 1
    # owner-routed mesh s/b update exchange (sharded.sb_routed_updates;
    # reference *_to_add owner-drain analog, application.h:56-59): each
    # device routes only its tp-range events into the dp gather — O(dp*B/tp)
    # wire/scatter work instead of O(dp*B). Bit-identical to the replicated
    # exchange below the 2x route cap; the deterministic overflow drop past
    # it is why the knob rides the header. Mesh archives only.
    mesh_route_sb: int = 0
    # PE anchor machinery ON THE MESH (round 4+): archives written before
    # this knob existed store mesh_dp > 1 + dna_mode PE_* + a nonzero
    # pe_log2_buckets but carry NO pe stream (the old writer zeroed the
    # anchor machinery on mesh paths). The knob discriminates the formats:
    # legacy mesh PE archives load 0 and decode with anchors off; new
    # writers store 1. Single-chip archives are unaffected (the gate only
    # applies when mesh_dp * mesh_tp > 1). Decode-affecting.
    dna_pe_mesh: int = 1
    # row-global s/b-mer updates (streams/dna.py DnaConfig.row_global): the
    # global tables evolve at read-row granularity inside each batch,
    # REPLACING the separate in-batch local tables — same freshness, far
    # less machinery (the local-table queries + row inserts were the single
    # largest cost of both encode modeling and the decode scan, profiled
    # round 3). When set, local_log2_cells is ignored. Decode-affecting,
    # in the header; legacy archives decode with 0.
    dna_row_global: int = 1

    def auto_tune_lanes(self) -> None:
        """Mode-tuned rANS lane count, called by the product entry points
        (CLI, bench) after mode flags settle. 2048 lanes cost ~1.2% DNA
        stream (coarser row-granular adaptation + per-lane state blocks)
        for ~+15-25% throughput (fewer, wider scan steps). The gate is
        per-config-measured (round-5 numbers, BENCH_r05 / BASELINE.md):
        SE original order WITH a quality stream widens — the DNA share of
        those archives absorbs the cost inside their measured bars
        (se 0.968x, se_real 1.0079 <= 1.01, qlossless 0.937x at 2048).
        Quality-less SE-original archives (-qm n) are pure-DNA, so the
        cost lands fully on the barred ratio (se_ids) — they keep 1024
        (measured: 2.6659 vs 2.6984 bits/base on the bench corpus).
        Sorted and PE modes keep 1024 (sorted 0.981x and pe 1.031x have
        no slack to spend). The count rides the archive header, so decode
        follows whatever the writer chose; callers that set n_lanes
        explicitly skip this."""
        if (self.n_lanes == 1024 and self.dna_mode == DnaMode.SE_ORIGINAL
                and self.quality_mode != QualityMode.NONE):
            self.n_lanes = 2048

    def adjust_kmer_sizes(self) -> None:
        """Auto-pick k-mer lengths from genome size (parity: params.h:131-155)."""
        for thr, prefix, pmer, smer, bmer in _KMER_TUNING:
            if self.genome_size <= thr:
                self.prefix_len = prefix
                self.pmer_len = pmer
                self.smer_len = smer
                self.bmer_len = bmer
                break
        # scale hash tables with genome size: ~2 cells per genome base
        import math

        gbases = self.genome_size * 1_000_000
        want = max(16, min(26, int(math.ceil(math.log2(max(1, gbases) / 4)))))
        # canonical tables hold 4 cells/bucket (tables.KBUCKET) vs the
        # legacy 8: one extra bucket bit keeps the cell capacity identical
        # at half the gather bytes per find. Hard cap 2^26 buckets
        # (3.2 GiB/table): at gs 3100 the uncapped 2^27 pair of tables
        # (12.9 GiB) plus one transient claim plane exceeds a 16 GiB chip
        # (measured RESOURCE_EXHAUSTED); WGS-scale capacity comes from
        # tp-sharding the tables across chips (parallel/sharded.py), which
        # divides the per-chip share, not from outgrowing one chip.
        extra = 1 if self.dna_canon > 0 else 0
        self.smer_log2_buckets = min(26, want + extra)
        self.bmer_log2_buckets = self.smer_log2_buckets
        self.pe_log2_buckets = max(14, want - 2)

    @property
    def siv_len(self) -> int:
        return min(self.pmer_len, self.dna_siv_cap)

    # --- archive header (self-describing, like reference store_params) ---
    _HDR_KEYS = (
        "dna_mode", "id_mode", "quality_mode", "quality_thr",
        "duplicates_check", "prefix_len", "pmer_len", "smer_len", "bmer_len",
        "max_id_len", "id_n_fields", "id_codec_v",
        "mesh_dp", "mesh_tp",
        "n_lanes", "max_batch_reads", "scale_bits",
        "smer_log2_buckets", "bmer_log2_buckets", "pe_log2_buckets",
        "local_log2_cells", "local_model_inc",
        "dna_mix_w", "dna_mix_b", "dna_sorted_ctx",
        "dna_repair_iters", "dna_claim_rounds", "dna_local_rc",
        "dna_pmer_gate", "dna_siv_cap", "dna_prefix_ramp",
        "dna_local_lite", "dna_canon", "dna_row_global", "dna_pe_pos_ctx",
        "dna_ctx_v", "dna_pe_mesh", "dna_rough", "dna_sb_proto",
        "mesh_route_sb", "dna_let_pb2",
    )

    # decode-affecting params whose absence in an archive header means the
    # writer predates the feature (NOT "use the current default")
    _HDR_LEGACY = {"local_log2_cells": 0, "local_model_inc": 8,
                   "id_codec_v": 1, "dna_mix_w": 0, "dna_mix_b": 64,
                   "dna_sorted_ctx": 0, "dna_repair_iters": 3,
                   "dna_claim_rounds": 2, "dna_local_rc": 1,
                   "dna_pmer_gate": 0, "dna_siv_cap": 13,
                   "dna_prefix_ramp": 0, "dna_local_lite": 0,
                   "dna_canon": 0, "dna_row_global": 0, "dna_pe_pos_ctx": 0,
                   "dna_ctx_v": 1, "dna_pe_mesh": 0, "dna_rough": 0,
                   "dna_sb_proto": 0, "mesh_route_sb": 0, "dna_let_pb2": 0}

    def store_params(self) -> bytes:
        d = {}
        for k in self._HDR_KEYS:
            v = getattr(self, k)
            d[k] = v.value if isinstance(v, enum.Enum) else v
        return json.dumps(d, sort_keys=True).encode()

    @classmethod
    def load_params(cls, blob: bytes, base: Optional["Params"] = None) -> "Params":
        d = json.loads(blob.decode())
        p = dataclasses.replace(base) if base else cls()
        for k in cls._HDR_KEYS:
            if k not in d:  # archive from an older writer
                if k in cls._HDR_LEGACY:
                    setattr(p, k, cls._HDR_LEGACY[k])
                continue
            v = d[k]
            cur = getattr(p, k)
            if isinstance(cur, enum.Enum):
                v = type(cur)(v)
            setattr(p, k, v)
        return p
