#!/usr/bin/env python3
"""Regenerate PinnedGoldens.scala from a Verify dump.

The fake chain (graft.evm.FakeChain) is a pure function of block number,
so the e5x/st63 query outputs are exactly reproducible. This script
freezes a dump into literal VALUES-based DuckDB oracle SQL, which the
driver then compares against future runs — a regression gate pinned at
the moment the output was human-reviewed.

Usage: python3 tools/pin_goldens.py /tmp/v_gold src/main/scala/graft/queries/PinnedGoldens.scala
"""
import sys, glob, os, datetime, decimal
import duckdb

QUERIES = [
    "e52_keccak256",  # sampled separately below
    "e53_blocks_transform", "e54_logs_transform",
    "e55_transactions_transform", "e56_blocks_pipeline",
    "e57_decoded_logs", "e58_decoded_traces", "e59_erc20_balances",
    "e60_decoded_logs_variant", "e61_config_pipeline", "e62_config_derived",
    "e63_config_transactions", "e64_config_logs", "e65_config_traces",
    "e66_config_decoded_traces", "e67_config_erc20_balances",
    "e69_config_decoded_logs_export",
    "st63_tip_catchup",
    "m75_image_decode",  # javax.imageio luma features of generated PNGs
    "m76_gif_frames",    # javax.imageio multi-frame GIF luma hashes
    "m78_phash_pairs",   # pHash (decode + StrictMath DCT) near-dup pairs
    "m81_video_frames",  # AVI container decode + frame-sampled pHash
    "m82_video_neardup", # video near-dup via per-frame pHash agreement
    "m83_video_mjpeg",   # MJPEG-in-AVI decode (JDK JPEG codec leg)
    "m84_video_landmarks", # time-shift tolerant video near-dup
    "m87_video_tolerant",  # trim+re-encode tolerant video landmarks
    "m89_mp4_frames",    # ISO-BMFF sample-table walk + frame pHash
    "m90_mp4_crossdedup", # same stream muxed AVI vs MP4, aligned tier
    "m92_fmp4_crossdedup", # AVI vs fragmented-MP4 (moof/trun walk)
    "m93_mkv_crossdedup",  # AVI vs Matroska/EBML (VfW + BlockGroup +
                           # unknown-size Segment legs), aligned tier
    "m95_video_joint",     # audio+video fusion verdict (reupload /
                           # same_audio / same_video classification)
    "m162_video_joint_rot", # the fusion verdict at the rotation-
                           # invariant constellation seam (tilted /
                           # rescaled re-uploads, track kept/replaced)
    "st77_stream_video_joint", # the fusion verdict in the streaming
                           # matrix (two tiers over one staged stream)
    "st116_stream_video_joint_rot", # the rot-seam fusion verdict
                           # in the streaming matrix (m162 tiers)
    "m168_video_joint_rot_index", # the fused verdict vs persisted
                           # indexes (no corpus re-decode)
    "st121_stream_joint_index_screen", # the fused verdict as a
                           # stream-static two-index broadcast screen
    "m100_video_index_dedup", # incremental video dedup vs the
                           # persisted (frame_idx, chunk, ckey) index
    "m102_phash_flip_pairs", # flip-tolerant image near-dup (mirrored
                           # reposts via dual-orientation hashing)
    "m103_video_flip_neardup", # flip-tolerant video near-dup (mirror
                           # + re-level re-uploads, dual-orientation)
    "st78_stream_phash_flip_dedup", # streaming flip-tolerant image
                           # dedup (as-is-only state, dual probes)
    "st79_stream_video_flip_dedup", # streaming flip-tolerant video
                           # dedup (trim+flip, oriented landmarks)
    "m105_phash_rot_pairs", # rotation-tolerant image near-dup (the
                           # phone-orientation repost, 4 grid turns)
    "m106_audio_spectral_dedup", # fractional-resample audio dedup
                           # (Goertzel band codes, StrictMath trig)
    "m110_audio_spectral_landmarks", # trim + fractional-resample
                           # compound (rate-free landmarks)
    "m114_audio_spectral_hop", # overlapped frames: 32 ms hop catches
                           # the 96 ms trim the default grid misses
    "st82_stream_spectral_landmark_dedup", # streaming spectral-landmark
                           # audio dedup (trim+resample re-delivery)
    "m112_index_dedup_dihedral", # dihedral-8 probes vs the as-is
                           # persisted pHash index
    "m113_spectral_index_dedup", # rate-free incremental screen vs the
                           # persisted spectral code index
    "st84_stream_spectral_dedup", # streaming aligned spectral audio
                           # dedup (44.1 kHz re-delivery of 8 kHz)
    "st85_stream_spectral_index_screen", # stream-static spectral index
                           # screen (no state store, broadcast join)
    "m109_phash_dihedral_pairs", # dihedral-8 single-pass image
                           # near-dup (mirror+rotate compound reposts)
    "m111_video_dihedral_neardup", # dihedral-8 video near-dup
                           # (rotated + rot-mirror compound reposts)
    "st83_stream_video_dihedral_dedup", # streaming dihedral-8 video
                           # dedup (trim + rotate/mirror re-delivery)
    "st81_stream_phash_dihedral_dedup", # streaming dihedral-8 image
                           # dedup (as-is-only state, 8-turn probes)
    "st80_stream_phash_rot_dedup", # streaming rotation-tolerant image
                           # dedup (as-is-only state, 4-turn probes)
    "st75_stream_video_landmark_dedup", # streaming video landmark dedup
    "m85_index_dedup",   # incremental image dedup vs persisted pHash index
    "st72_stream_phash_dedup",  # streaming pHash chunk-state dedup
    "t68_bpe_batched",   # batched BPE rules (corpus is seed-fixed; 64
                         # data-dependent batches aren't SQL-unrollable)
    "m115_audio_onset_landmarks", # onset-anchored spectral landmarks
                           # (arbitrary-offset trim + fractional resample)
    "m116_phash_exif",   # EXIF orientation normalized at decode (tagged
                         # camera reposts land via the PLAIN pHash tier)
    "t79_cdc_bounded",   # hard min/max CDC chunk bounds (stateful
                         # boundary set — outside SQL replay by design)
    "st89_stream_onset_landmark_dedup", # streaming onset-landmark
                           # audio dedup (arbitrary-offset trim re-delivery)
    "m117_audio_onset_releveled", # adaptive (peak-relative) onset
                           # threshold: re-leveled+trim+resample compound
    "m118_onset_index_dedup", # incremental screen vs the persisted
                           # onset-landmark index (landmark-keyed)
    "m119_audio_onset_noisy", # rolling-RMS onset detection: noisy-floor
                           # (hum under the beats) trim+resample re-uploads
    "m120_audio_speed_neardup", # onset-interval-ratio landmarks:
                           # 5% speed-change (tempo+pitch) re-uploads
    "m121_interval_index_dedup", # incremental screen vs the persisted
                           # interval-ratio landmark index
    "st92_stream_speed_dedup", # streaming speed-change dedup (interval-
                           # ratio landmark buckets)
    "st93_stream_noisy_onset_dedup", # streaming noisy-floor dedup
                           # (rolling-RMS onset landmark buckets)
    "m122_video_rate_neardup", # frame-rate-converted video dedup
                           # (skip-tolerant run-collapsed landmarks)
    "m123_video_rate_index_dedup", # incremental screen vs the persisted
                           # skip-landmark video index
    "st94_stream_video_rate_dedup", # streaming frame-rate-converted
                           # video dedup (skip-landmark buckets)
    "m124_audio_pitch_chroma", # constant-Q chroma landmarks: semitone
                           # pitch/speed-shifted metronomic re-uploads
    "m125_chroma_index_dedup", # incremental screen vs the persisted
                           # pitch-class chroma index
    "st95_stream_pitch_chroma_dedup", # streaming pitch-shifted
                           # metronomic dedup (chroma-code buckets)
    "m126_audio_quarter_tone", # sub-semitone (div=24) chroma bank:
                           # quarter-tone shifts the semitone bank misses
    "m127_rolling_onset_index_dedup", # rolling-detector onset index:
                           # standing NOISY corpus, incremental screen
    "m128_phash_crop_pairs", # crop-tolerant image dedup: canonical-
                           # window hashes (center/quadrant crops)
    "m129_crop_index_dedup", # incremental screen vs the persisted
                           # crop-window pHash index
    "st96_stream_crop_dedup", # streaming crop-tolerant image dedup
                           # (window hashes in chunk-bucket state)
    "m130_video_crop_neardup", # cropped-video dedup: per-frame crop-
                           # window landmark channels
    "m131_video_crop_index_dedup", # incremental screen vs the persisted
                           # crop-window video landmark index
    "st97_stream_video_crop_dedup", # streaming cropped-video dedup
                           # (window-channel landmark buckets)
    "m132_phash_thirds_crop", # extended thirds crop-window ladder:
                           # rule-of-thirds recomposition crops
    "m133_thirds_crop_index",
    "st98_stream_thirds_crop_dedup",
    "m136_peak_crop_pairs",
    "m138_video_peak_crop_neardup",
    "st102_stream_video_peak_dedup",
    "m145_scale_dihedral_pairs",
    "m146_scale_index_dihedral",
    "st107_stream_scale_dihedral_dedup",
    "m149_scale_lossy_pairs",
    "m163_scale_deep_lossy_pairs",
    "m165_scale_strong_squeeze", # canonical (moment-isotropic
                           # resample before detection) squeeze tier
    "m166_canonical_index_dedup", # canonical index + unknown-
                           # squeeze ingest screen (CanonFpVersion)
    "st117_stream_canonical_dedup", # the canonical tier in the
                           # streaming matrix (squeezed re-delivery)
    "m167_video_canonical_pairs", # unknown-anamorphic video via
                           # per-frame canonical pooling
    "st118_stream_video_canonical_dedup", # its streaming member
    "m169_affine_pairs",   # full-affine (rot x squeeze x scale)
                           # via one-shot symmetric whitening
    "m170_affine_index_dedup", # affine index + ingest screen
    "st120_stream_affine_dedup", # the affine tier streaming member
    "m171_video_affine_pairs", # tilted anamorphic VIDEO rips
    "m172_video_canonical_index", # canonical video index screen
    "m173_video_affine_index", # affine video index screen
    "m174_affine_frame_pairs", # crop x affine geometric-hash pairs
    "m176_affine_frame_index", # crop x affine index screen
    "st123_stream_affine_frame_screen", # its stream-static member
    "m177_video_affine_frame_pairs", # crop x affine VIDEO rips
    "m178_video_affine_frame_index", # its video index screen
    "m179_affine_frame_verified", # RANSAC-verified gray-zone pairs
    "m180_affine_frame_verified_screen", # both screens contrasted
    "st124_stream_affine_verified_screen", # verified screen mid-stream
    "m181_affine_frame_chiral", # mirrored compounds via (u,v) swap
    "m182_video_affine_frame_verified", # RANSAC-verified gray-zone
                           # video compounds (pooled anchor clouds)
    "m183_affine_frame_chiral_verified", # chirality-matched verify
                           # (det<0 maps) on mirrored gray-zone compounds
    "m184_affine_frame_squeeze_fan", # de-squeeze hypothesis fan:
                           # crop x rotation x 3.0-4.0:1 extreme squeeze
    "m185_affine_frame_growth",  # data-proportional recall aggregate
    "m186_affine_frame_verified_growth", # RANSAC tier, same corpus
    "m187_video_affine_frame_chiral", # mirrored video re-rips via the
                           # pooled mirror repack (orient 1)
    "m188_video_affine_frame_chiral_verified", # chirality-matched
                           # RANSAC on mirrored gray-zone video
    "m189_affine_frame_squeeze_fan_index", # de-squeeze fan at the
                           # incremental seam (code vs fan tiers)
    "st125_stream_affine_chiral_screen", # mirror fan vs broadcast
                           # identity index, stateless
    "m190_affine_frame_chiral_index", # chiral readout at the
                           # incremental seam (code vs chiral tiers)
    "st126_stream_affine_squeeze_fan_screen", # de-squeeze fan vs
                           # broadcast identity index, stateless
    "m191_video_affine_frame_squeeze_fan", # de-squeeze fan pooled
                           # per video (extreme-squeeze re-rips)
    "m175_stationary_audio_gate", # stationary-audio scope gate
    "m158_audio_compound_interval",
    "m159_audio_pitch_verified",
    "m164_audio_half_tone_verified",
    "m160_aspect_norm_pairs",
    "m156_video_aspect_pairs",
    "m157_video_aspect_index_dedup",
    "st113_stream_video_aspect_dedup",
    "m154_video_rot_pairs",
    "m155_video_rot_index_dedup",
    "st112_stream_video_rot_dedup",
    "m152_aspect_pairs",
    "m153_aspect_index_dedup",
    "st111_stream_aspect_dedup",
    "m150_rot_scale_pairs",
    "m151_rot_scale_index_dedup",
    "st110_stream_rot_scale_dedup",
    "st109_stream_scale_index_screen",
    "m161_texture_scope_gate",
    "st114_stream_winnow_index_screen",
    "st115_stream_cdc_index_screen",
    "m147_video_scale_pairs",
    "m148_video_scale_index_dedup",
    "st108_stream_video_scale_dedup",
    "m140_peak_dihedral_crop_pairs",
    "st105_stream_peak_lossy_dedup",
    "m143_scale_crop_pairs",
    "m144_scale_index_dedup",
    "st106_stream_scale_dedup",
    "m142_peak_lossy_index_dedup",
    "m141_peak_lossy_crop_pairs",
    "st104_stream_peak_dihedral_dedup",
    "st103_stream_peak_index_screen",
    "m139_video_peak_index_dedup",
    "m137_peak_index_dedup",
    "st101_stream_peak_crop_dedup",
    "m135_quarter_tone_index",
    "st100_stream_quarter_tone_dedup",
    "m134_video_thirds_index",
    "st99_stream_video_thirds_dedup",
]
# e52 is 2000 rows; pin a deterministic 50-row sample (p_partkey % 40 == 0)
SAMPLE = {"e52_keccak256": "p_partkey % 40 = 0"}

dump, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()

def lit(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        # repr is the shortest round-trip form; CAST('…' AS DOUBLE) in
        # DuckDB is correctly rounded, so the pinned double is exact
        return "'" + repr(v) + "'"
    if isinstance(v, decimal.Decimal):
        return f"'{v:f}'"
    if isinstance(v, datetime.datetime):
        return "'" + v.strftime("%Y-%m-%d %H:%M:%S.%f") + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unhandled literal type {type(v)}: {v!r}")

def sql_for(name):
    rel = con.sql(f"SELECT * FROM '{dump}/{name}/*.parquet'")
    cols, types = rel.columns, [str(t) for t in rel.types]
    where = SAMPLE.get(name)
    if where:
        rel = rel.filter(where)
    rows = rel.fetchall()
    assert rows, f"{name}: empty dump"
    casts = ", ".join(
        f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types))
    values = ",\n".join(
        "  (" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    # ORDER BY every column: the driver's compare sorts rows before
    # hashing, so order is cosmetic — but a two-column prefix can tie
    # (the m140 orient rows), and a total order keeps the emitted
    # golden deterministic without hand-edits after regeneration
    return (f"SELECT {casts} FROM (VALUES\n{values}\n)"
            f" AS t({', '.join(cols)}) ORDER BY {', '.join(cols)}")

entries = []
for name in QUERIES:
    s = sql_for(name)
    assert '"""' not in s
    entries.append(f'    "{name}" ->\n      """{s}""",')

body = "\n".join(entries).rstrip(",")
scala = f"""package graft.queries

/** Pinned golden oracles for the deterministic fake-chain queries.
  *
  * GENERATED by tools/pin_goldens.py from a reviewed Verify dump — do
  * not hand-edit values. The fake chain (evm/FakeChain.scala) is a pure
  * function of block number, so these literals are stable across runs;
  * the driver's DuckDB compare turns them into a regression gate.
  * e52 pins a deterministic 50-row sample (p_partkey %% 40 == 0) of the
  * keccak output; the query itself filters to the same sample, so
  * golden and query rows correspond 1:1.
  */
object PinnedGoldens {{
  val sql: Map[String, String] = Map(
{body}
  )
}}
"""
with open(out, "w") as f:
    f.write(scala)
print(f"wrote {out}: {len(entries)} goldens")
