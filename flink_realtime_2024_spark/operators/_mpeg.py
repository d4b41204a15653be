"""From-scratch MP3 / H.264 *structure* codecs, no external libraries.

Closes the metadata half of the compressed-stream seam (multimodal.py
previously declared MP3/H.264 entirely external): a 100 TB curation
pipeline rarely needs PCM samples or pixels from these containers —
it needs duration, bitrate, sample rate, and frame dimensions to
filter, bucket, and cost media corpora. Those live in the stream
STRUCTURE, which both specs define publicly and which this module
reads (and writes, for fixtures) bit-exactly:

- **Layer III (ISO/IEC 11172-3; 13818-3 LSF; MPEG-2.5 extension)**:
  the 32-bit frame header — 11-bit syncword, version/layer fields,
  4-bit bitrate index against the per-version Layer III table, 2-bit
  sample-rate index, padding bit — and the resulting frame length
  ``(144|72) * bitrate / sample_rate + padding`` (72 for the
  low-sampling-frequency MPEG-2/2.5 versions, whose frames carry 576
  samples instead of 1152). The walker validates the sync at every
  computed frame offset (a real frame walk, not a single-header
  read), skips a leading ID3v2 tag via its syncsafe 28-bit size
  (ID3v2.3 spec §3.1), and times each frame by its own version and
  sample rate.
- **H.264 Annex B (ITU-T H.264 §B.1 / §7.3.2.1)**: start-code NAL
  unit segmentation, RBSP emulation-prevention stripping (00 00 03 →
  00 00), and a bit-level exp-Golomb parse of the sequence parameter
  set — profile/level, ``pic_width_in_mbs_minus1``,
  ``pic_height_in_map_units_minus1``, ``frame_mbs_only_flag`` and the
  frame-cropping rectangle — yielding exact luma dimensions. Slice
  NALs (types 1/5) are counted as frames.

Entropy decode (Huffman audio data, CABAC/CAVLC slice data) is a
PERMANENT documented drop (round 9; rationale in SURVEY §2.12, same
pattern as the S6/T9 drops): the structure layer above it — the part
a curation pipeline consumes — is implemented and oracle-checked
(mm_stream_meta derives the same values from the synthesizer's md5
seed in DuckDB); full PCM/pixel decode is the named ffmpeg/PyAV
swap-in, and its lossy output could never carry a SQL oracle anyway.
Do not re-litigate in future rounds.

Reference parity: the reference's media surface is POM-level
(flink connectors move opaque payloads); this module exists so the
L6 "typed metadata from binary columns" step (SURVEY §2.10) is a
real parse for the two containers a text+media crawl actually ships.
"""

from __future__ import annotations

import numpy as np

# --- Layer III tables (ISO/IEC 11172-3 Table B.1; ISO/IEC 13818-3 for
# the MPEG-2 LSF column; MPEG-2.5 is the de-facto 0b00 version-bit
# extension halving the MPEG-2 sample rates) ---

MP3_BITRATES_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
MP3_BITRATES_KBPS_V2 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
MP3_SAMPLE_RATES = (44100, 48000, 32000)       # MPEG-1 (version bits 11)
MP3_SAMPLE_RATES_V2 = (22050, 24000, 16000)    # MPEG-2 (version bits 10)
MP3_SAMPLE_RATES_V25 = (11025, 12000, 8000)    # MPEG-2.5 (version bits 00)
MP3_SAMPLES_PER_FRAME = 1152                   # Layer III MPEG-1
MP3_SAMPLES_PER_FRAME_LSF = 576                # Layer III MPEG-2/2.5 (LSF)


def _mp3_frame_len(
    bitrate_kbps: int, sample_rate: int, padding: int, lsf: bool = False
) -> int:
    # 144 = 1152 samples / 8 bits; LSF halves the granule count → 72
    coeff = 72 if lsf else 144
    return coeff * bitrate_kbps * 1000 // sample_rate + padding


def encode_mp3(
    n_frames: int,
    bitrate_idx: int,
    sr_idx: int,
    rng: np.random.RandomState,
    id3_size: int = 0,
) -> bytes:
    """Emit a structurally-valid MPEG-1 Layer III stream: optional ID3v2.3
    tag, then ``n_frames`` frames with correct headers and rng side-data
    (the entropy payload is opaque to the walker, which advances by the
    header-computed frame length). ``bitrate_idx`` is 1-based into the
    Layer III table (header field value, 1..14)."""
    if not 1 <= bitrate_idx <= 14 or not 0 <= sr_idx <= 2:
        raise ValueError("bitrate_idx in 1..14, sr_idx in 0..2")
    out = bytearray()
    if id3_size:
        # ID3v2.3 header: "ID3", version, flags, 28-bit syncsafe size
        out += b"ID3\x03\x00\x00"
        out += bytes(
            [(id3_size >> 21) & 0x7F, (id3_size >> 14) & 0x7F,
             (id3_size >> 7) & 0x7F, id3_size & 0x7F]
        )
        out += rng.randint(1, 256, size=id3_size).astype(np.uint8).tobytes()
    bitrate = MP3_BITRATES_KBPS[bitrate_idx - 1]
    sr = MP3_SAMPLE_RATES[sr_idx]
    # AAAAAAAA AAABBCCD: sync=111_1111_1111, version=11 (MPEG-1),
    # layer=01 (III), protection=1 (no CRC) -> 0xFF 0xFB
    hdr23 = (bitrate_idx << 4) | (sr_idx << 2)  # EEEEFFGH, padding=0
    for _ in range(n_frames):
        frame_len = _mp3_frame_len(bitrate, sr, 0)
        body = rng.randint(0, 256, size=frame_len - 4).astype(np.uint8).tobytes()
        out += bytes([0xFF, 0xFB, hdr23, 0x00]) + body
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Frame-walk a Layer III stream (MPEG-1, MPEG-2 LSF, or MPEG-2.5):
    skip ID3v2, then validate the 11-bit sync + version/layer fields at
    every computed frame offset. Returns sample_rate, bitrate_kbps (of
    the first frame — CBR fixtures), n_frames, duration_ms (summed
    per-frame, so mixed-version streams still time correctly)."""
    off = 0
    if payload[:3] == b"ID3":
        if len(payload) < 10:
            raise ValueError("truncated ID3v2 header")
        size = (
            ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14)
            | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
        )
        # the syncsafe size excludes the 10-byte header AND the 10-byte
        # footer an ID3v2.4 tag may append (flags bit 0x10) — skipping
        # only `10 + size` on a footered tag would lose sync 10 bytes
        # early and misclassify a valid file as corrupt
        off = 10 + size + (10 if payload[5] & 0x10 else 0)
    n_frames = 0
    sample_rate = bitrate = None
    # integer sample tally per rate, divided once at the end: for the
    # (usual) single-rate stream this is bit-identical to the closed
    # form n_frames * samples_per_frame * 1000.0 / sr that the
    # mm_stream_meta DuckDB oracle computes (the driver gate is EXACT
    # float equality), while mixed-rate streams still time correctly
    samples_by_sr: dict[int, int] = {}
    while off + 4 <= len(payload):
        b0, b1, b2, _ = payload[off : off + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost MP3 sync at offset {off}")
        version = (b1 & 0x18) >> 3  # 11=MPEG-1, 10=MPEG-2, 00=MPEG-2.5
        if version == 0b01 or (b1 & 0x06) >> 1 != 0b01:
            raise ValueError("not a Layer III frame (reserved version/layer)")
        lsf = version != 0b11
        br_idx, sr_idx, padding = b2 >> 4, (b2 >> 2) & 0x3, (b2 >> 1) & 0x1
        if not 1 <= br_idx <= 14 or sr_idx > 2:
            raise ValueError("reserved bitrate/sample-rate index")
        fr_bitrate = (MP3_BITRATES_KBPS_V2 if lsf else MP3_BITRATES_KBPS)[br_idx - 1]
        fr_sr = (
            MP3_SAMPLE_RATES if version == 0b11
            else MP3_SAMPLE_RATES_V2 if version == 0b10
            else MP3_SAMPLE_RATES_V25
        )[sr_idx]
        if sample_rate is None:
            sample_rate, bitrate = fr_sr, fr_bitrate
        n_frames += 1
        spf = MP3_SAMPLES_PER_FRAME_LSF if lsf else MP3_SAMPLES_PER_FRAME
        samples_by_sr[fr_sr] = samples_by_sr.get(fr_sr, 0) + spf
        off += _mp3_frame_len(fr_bitrate, fr_sr, padding, lsf)
    if off != len(payload):
        raise ValueError("trailing bytes after last MP3 frame")
    if n_frames == 0:
        raise ValueError("no MP3 frames in payload")
    return {
        "sample_rate": sample_rate,
        "bitrate_kbps": bitrate,
        "n_frames": n_frames,
        "duration_ms": sum(s * 1000.0 / sr for sr, s in samples_by_sr.items()),
    }


# --- H.264 bit I/O (ITU-T H.264 §7.2: f(n)/u(n), §9.1: ue(v)) ---


class _BitWriter:
    """MSB-first bit writer with unsigned exp-Golomb (ue)."""

    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        self._bits.extend((value >> i) & 1 for i in range(n - 1, -1, -1))

    def ue(self, value: int) -> None:
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def rbsp_trailing(self) -> bytes:
        self._bits.append(1)  # rbsp_stop_one_bit
        while len(self._bits) % 8:
            self._bits.append(0)
        by = bytearray()
        for i in range(0, len(self._bits), 8):
            acc = 0
            for b in self._bits[i : i + 8]:
                acc = (acc << 1) | b
            by.append(acc)
        return bytes(by)


class _BitReader:
    """MSB-first bit reader with unsigned exp-Golomb (ue)."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0

    def u(self, n: int) -> int:
        acc = 0
        for _ in range(n):
            byte = self._data[self._pos >> 3]
            acc = (acc << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return acc

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)


def _ep_insert(rbsp: bytes) -> bytes:
    """RBSP → EBSP: insert emulation_prevention_three_byte after any
    00 00 followed by a byte ≤ 0x03 (H.264 §7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_strip(ebsp: bytes) -> bytes:
    """EBSP → RBSP: drop the 0x03 of every 00 00 03 sequence."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


_START = b"\x00\x00\x00\x01"


def encode_h264(
    width: int, height: int, n_slices: int, rng: np.random.RandomState
) -> bytes:
    """Emit a structurally-valid H.264 Annex-B stream: SPS (baseline
    profile 66, frame_mbs_only, no cropping — dims must be multiples
    of 16), a minimal PPS, and ``n_slices`` IDR slice NALs whose
    entropy payload is opaque rng bytes (nonzero, so no start-code
    emulation arises in slice data)."""
    if width % 16 or height % 16:
        raise ValueError("fixture dims must be multiples of 16 (no cropping)")
    w = _BitWriter()
    w.u(66, 8)      # profile_idc: baseline
    w.u(0, 8)       # constraint flags + reserved_zero_2bits
    w.u(30, 8)      # level_idc 3.0
    w.ue(0)         # seq_parameter_set_id
    w.ue(0)         # log2_max_frame_num_minus4
    w.ue(2)         # pic_order_cnt_type
    w.ue(1)         # max_num_ref_frames
    w.u(0, 1)       # gaps_in_frame_num_value_allowed_flag
    w.ue(width // 16 - 1)   # pic_width_in_mbs_minus1
    w.ue(height // 16 - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)       # frame_mbs_only_flag
    w.u(0, 1)       # direct_8x8_inference_flag
    w.u(0, 1)       # frame_cropping_flag
    w.u(0, 1)       # vui_parameters_present_flag
    sps = bytes([0x67]) + _ep_insert(w.rbsp_trailing())  # nal_ref_idc=3, type 7

    p = _BitWriter()
    p.ue(0)         # pic_parameter_set_id
    p.ue(0)         # seq_parameter_set_id
    p.u(0, 1)       # entropy_coding_mode_flag (CAVLC)
    p.u(0, 1)       # bottom_field_pic_order_in_frame_present_flag
    p.ue(0)         # num_slice_groups_minus1
    p.ue(0)         # num_ref_idx_l0_default_active_minus1
    p.ue(0)         # num_ref_idx_l1_default_active_minus1
    p.u(0, 1)       # weighted_pred_flag
    p.u(0, 2)       # weighted_bipred_idc
    p.ue(0)         # pic_init_qp_minus26 (se(0) == ue(0))
    p.ue(0)         # pic_init_qs_minus26
    p.ue(0)         # chroma_qp_index_offset
    p.u(1, 1)       # deblocking_filter_control_present_flag
    p.u(0, 1)       # constrained_intra_pred_flag
    p.u(0, 1)       # redundant_pic_cnt_present_flag
    pps = bytes([0x68]) + _ep_insert(p.rbsp_trailing())  # type 8

    out = bytearray(_START + sps + _START + pps)
    for _ in range(n_slices):
        body_len = 32 + int(rng.randint(0, 96))
        body = rng.randint(1, 256, size=body_len).astype(np.uint8).tobytes()
        out += _START + bytes([0x65]) + body  # nal_ref_idc=3, type 5 (IDR)
    return bytes(out)


def _split_nals(payload: bytes) -> list[bytes]:
    """Annex-B byte-stream segmentation (§B.1): NAL units delimited by
    3- or 4-byte start codes."""
    nals = []
    i = payload.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("no Annex-B start code")
    i += 3
    while True:
        j = payload.find(b"\x00\x00\x01", i)
        if j < 0:
            nals.append(payload[i:])
            return nals
        end = j
        if end > i and payload[end - 1] == 0:  # 4-byte start code
            end -= 1
        nals.append(payload[i:end])
        i = j + 3


def parse_h264(payload: bytes) -> dict:
    """Parse an Annex-B stream's SPS for exact luma dimensions and count
    slice NALs (types 1/5) as frames. Handles emulation prevention,
    frame_mbs_only and the cropping rectangle (4:2:0 crop units)."""
    width = height = None
    n_frames = 0
    for nal in _split_nals(payload):
        if not nal:  # adjacent start codes (stray zero padding)
            continue
        ntype = nal[0] & 0x1F
        if ntype == 7 and width is None:
            r = _BitReader(_ep_strip(nal[1:]))
            profile = r.u(8)
            r.u(8)  # constraint flags
            r.u(8)  # level_idc
            r.ue()  # seq_parameter_set_id
            if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
                if r.ue() == 3:  # chroma_format_idc
                    r.u(1)  # separate_colour_plane_flag
                r.ue()  # bit_depth_luma_minus8
                r.ue()  # bit_depth_chroma_minus8
                r.u(1)  # qpprime_y_zero_transform_bypass_flag
                if r.u(1):  # seq_scaling_matrix_present_flag
                    raise ValueError("scaling matrices unsupported")
            r.ue()  # log2_max_frame_num_minus4
            poc_type = r.ue()
            if poc_type == 0:
                r.ue()  # log2_max_pic_order_cnt_lsb_minus4
            elif poc_type == 1:
                r.u(1)  # delta_pic_order_always_zero_flag
                r.ue()  # offset_for_non_ref_pic (se: same bit count)
                r.ue()  # offset_for_top_to_bottom_field
                for _ in range(r.ue()):
                    r.ue()
            r.ue()  # max_num_ref_frames
            r.u(1)  # gaps_in_frame_num_value_allowed_flag
            pw_mbs = r.ue() + 1
            ph_units = r.ue() + 1
            frame_mbs_only = r.u(1)
            if not frame_mbs_only:
                r.u(1)  # mb_adaptive_frame_field_flag
            r.u(1)  # direct_8x8_inference_flag
            crop_l = crop_r = crop_t = crop_b = 0
            if r.u(1):  # frame_cropping_flag
                crop_l, crop_r, crop_t, crop_b = (r.ue() for _ in range(4))
            # 4:2:0 crop units: 2 horizontally, 2*(2-frame_mbs_only) vertically
            width = pw_mbs * 16 - 2 * (crop_l + crop_r)
            height = (2 - frame_mbs_only) * ph_units * 16 - 2 * (
                2 - frame_mbs_only
            ) * (crop_t + crop_b)
        elif ntype in (1, 5):
            n_frames += 1
    if width is None:
        raise ValueError("no SPS in stream")
    return {"width": width, "height": height, "n_frames": n_frames}
