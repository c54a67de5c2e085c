"""Configuration system for the eve_tpu framework.

Reproduces the behavior of the reference config layer
(``/root/reference/src/core/config_default.py:31-287``): a singleton object
holding typed parameters, JSON-file and dict/CLI overrides with strict type
checking (int -> float coercion only), immutability outside ``import_*`` /
``override``, derived ``learning_rate`` property, full-config JSON dump and
run-provenance capture (``combined.json`` + ``src.zip`` of all sources).

Key names match the reference exactly so that the reference's JSON configs
(``src/configs/eye_net.json``, ``src/configs/refine_net.json``) run unmodified.
TPU-specific additions are grouped at the end and prefixed ``tpu_`` / ``jax_``.

Design note (deliberate deviation from SURVEY.md section 7's
"dataclass/pytree config" sketch): this host-side singleton intentionally
mirrors the reference's config *machinery*, not just its key schema. The
config is pure host state — it never enters a jitted computation, so a
pytree buys nothing — while the singleton + strict-typed-override behavior
is itself part of the reference's observable CLI/JSON contract (later JSONs
override earlier ones in place, CLI flags override both, unknown/badly-typed
keys fail loudly). What DOES cross into XLA is ``EveSpec``
(eve_tpu/models/eve.py), a frozen dataclass derived from this config — that
is the pytree-friendly half of the blueprint, kept separate on purpose.
"""

import glob
import json
import logging
import os
import sys
import zipfile

logger = logging.getLogger(__name__)


_REMAT_MODES = ('none', 'eye', 'refine', 'all')


def _normalize_remat(value):
    """Coerce a tpu_remat value to its canonical string form.

    Accepts the round-1 booleans (and their CLI string spellings) and the
    granularity strings; anything else raises so a typo like 'eyes' cannot
    silently disable rematerialization.
    """
    if isinstance(value, bool):
        return 'all' if value else 'none'
    if isinstance(value, str):
        low = value.lower()
        if low in ('true', 'yes', 'y', '1'):
            return 'all'
        if low in ('false', 'no', 'n', '0'):
            return 'none'
        if low in _REMAT_MODES:
            return low
    raise ValueError(
        'Invalid tpu_remat value %r: expected one of %s (or a boolean)'
        % (value, list(_REMAT_MODES)))


class DefaultConfig(object):
    """Singleton configuration object.

    Precedence: class defaults -> JSON files (in argv order) -> CLI flags.
    """

    # Tag appended to the experiment identifier
    identifier_suffix = ''

    # Misc. notes
    note = ''

    # Data sources
    datasrc_eve = '/path/to/eve/dataset'

    # Data loading
    video_decoder_codec = 'libx264'  # libx264 | nvdec (ignored; cv2/ffmpeg host decode)
    assumed_frame_rate = 10  # Frames are skipped from source videos accordingly
    max_sequence_len = 30  # In frames assuming 10 Hz
    face_size = [256, 256]  # width, height
    eyes_size = [128, 128]  # width, height
    screen_size = [128, 72]  # width, height
    actual_screen_size = [1920, 1080]  # DO NOT CHANGE
    camera_frame_type = 'eyes'  # full | face | eyes
    load_screen_content = False
    load_full_frame_for_visualization = False

    train_cameras = ['basler', 'webcam_l', 'webcam_c', 'webcam_r']
    train_stimuli = ['image', 'video', 'wikipedia']
    test_cameras = ['basler', 'webcam_l', 'webcam_c', 'webcam_r']
    test_stimuli = ['image', 'video', 'wikipedia']

    # Inference
    input_path = ''
    output_path = ''

    # Training
    skip_training = False
    fully_reproducible = False

    batch_size = 16
    weight_decay = 0.001
    num_epochs = 10.0

    train_data_workers = 8

    log_every_n_steps = 1
    tensorboard_scalars_every_n_steps = 1
    tensorboard_images_every_n_steps = 10
    tensorboard_learning_rate_every_n_steps = 100

    # Learning rate
    base_learning_rate = 0.0005

    @property
    def learning_rate(self):
        """batch_size * base_learning_rate (linear-scaling rule; reference src/core/config_default.py:81-83)."""
        return self.batch_size * self.base_learning_rate

    # LR schedule: 'none' | 'exponential' | 'cyclic'
    num_warmup_epochs = 0.0
    lr_decay_strategy = 'none'
    lr_decay_factor = 0.5
    lr_decay_epoch_interval = 0.5

    # Gradient clipping
    do_gradient_clipping = True
    gradient_clip_by = 'norm'  # 'norm' or 'value'
    gradient_clip_amount = 5.0

    # Eye gaze network configuration
    eye_net_load_pretrained = False
    eye_net_frozen = False
    eye_net_use_rnn = True
    eye_net_rnn_type = 'GRU'  # 'RNN' | 'LSTM' | 'GRU'
    eye_net_rnn_num_cells = 1
    eye_net_rnn_num_features = 128
    eye_net_static_num_features = 128
    eye_net_use_head_pose_input = True
    loss_coeff_PoG_cm_initial = 0.0
    loss_coeff_g_ang_initial = 1.0
    loss_coeff_pupil_size = 1.0

    # Conditional refine network configuration
    refine_net_enabled = False
    refine_net_load_pretrained = False

    refine_net_do_offset_augmentation = True
    refine_net_offset_augmentation_sigma = 3.0
    # Per-sample probability of ZEROING the offset augmentation (training
    # sees the true initial estimate instead of a kappa-offset one).
    # 0.0 = reference semantics (every sample augmented,
    # ref eve.py:462-476). Nonzero values teach estimate-quality-aware
    # heads — the 'gated' TPU-native readout's gate only learns to KEEP a
    # good initial if training ever shows it one (with sigma=3 deg the
    # augmented initial is ~100 px off on average, so at 0.0 the gate
    # learns "always trust the heatmap" and drags a 15 px initial to the
    # ~20 px heatmap readout — measured, BASELINE.md round-5 staged
    # study). Recommended 0.5 with tpu_native_refine_head='gated'.
    refine_net_offset_augmentation_zero_prob = 0.0

    refine_net_use_skip_connections = True

    refine_net_use_rnn = True
    refine_net_rnn_type = 'CGRU'  # 'CRNN' | 'CLSTM' | 'CGRU'
    refine_net_rnn_num_cells = 1
    refine_net_num_features = 64
    loss_coeff_heatmap_ce_initial = 0.0
    loss_coeff_heatmap_ce_final = 1.0
    loss_coeff_heatmap_mse_final = 0.0
    loss_coeff_PoG_cm_final = 0.001

    # Heatmaps
    gaze_heatmap_size = [128, 72]
    gaze_heatmap_sigma_initial = 10.0  # in pixels
    gaze_heatmap_sigma_history = 3.0  # in pixels
    gaze_heatmap_sigma_final = 5.0  # in pixels
    gaze_history_map_decay_per_ms = 0.999

    # Evaluation
    test_num_samples = 128
    test_batch_size = 128
    test_data_workers = 0
    test_every_n_steps = 500
    full_test_batch_size = 128
    full_test_data_workers = 4

    codalab_eval_batch_size = 128
    codalab_eval_data_workers = 1

    # Checkpoints management
    checkpoints_save_every_n_steps = 100
    checkpoints_keep_n = 3
    resume_from = ''

    # Auto-resume: when set (and resume_from is not), training looks for
    # the newest existing run directory with the SAME config hash (the
    # .<md5[:6]> identifier suffix) that has checkpoints, and resumes it.
    # This closes the preemption loop: SIGTERM -> checkpoint + exit 143 ->
    # the supervisor restarts the job with identical argv -> the run
    # continues where it left off. A changed config hashes differently and
    # starts fresh (a different config is a different experiment).
    auto_resume = False

    # Google Sheets related
    gsheet_secrets_json_file = ''
    gsheet_workbook_key = ''

    # ------------------------------------------------------------------
    # TPU / JAX-specific additions (not present in the reference)
    # ------------------------------------------------------------------

    # Computation dtype for the CNN stacks: 'float32' | 'bfloat16'.
    # Geometry, soft-argmax and losses always accumulate in float32.
    tpu_compute_dtype = 'float32'

    # Use fused Pallas kernels for heatmap render / soft-argmax on TPU.
    # Both kernels compile and run on the live Mosaic toolchain (the old
    # soft-argmax SIGABRT was bisected to multi-axis reductions and fixed
    # by staging them single-axis, kernels/heatmap_kernels.py). Default
    # off because the XLA formulations measure at the HBM roofline on v5e
    # (~0.017 ms each at N=480 vs ~0.02 ms Pallas; end-to-end the
    # pallas_call boundaries also break fusion: 12.1k vs 13.4k frames/s,
    # BASELINE.md) — the flag is safe, just not a win on this model.
    tpu_use_pallas = False

    # Opt-in TPU-native model topology (models/refine_net_tpu.py). The
    # reference topology structurally underfills the MXU: 16-32-channel
    # 3x3 convs at 72x128 occupy ~1/8 of the 128 systolic lanes and their
    # fine-level activations dominate HBM traffic (BASELINE.md "inference
    # phase attribution": the refine band is ~2/3 of inference at ~32%
    # MXU, and every parity-preserving rewrite measurably lost). This
    # variant replaces the fine pyramid levels with a 4x4 patchify conv
    # to 128 channels and a zero-init sub-pixel head (same encoder-
    # decoder + ConvGRU + soft-argmax contract, identical recurrent-state
    # shapes), and swaps the EyeNet 7x7/2-conv+maxpool stem for one
    # 8x8/4 patch-embedding conv. NOT weight-compatible with the
    # reference/released checkpoints — the converter refuses; train from
    # scratch. The default (off) path's reference parity is untouched.
    tpu_native_arch = False
    # TPU-native EyeNet stem variant: 'patchify' (8x8/4, the demonstrated
    # default) or 'patchify8' (8x8/8 — quarters every residual stage's
    # spatial work for a faster, coarser backbone; measured speed AND
    # held-out-accuracy trade recorded in BASELINE.md before offering).
    # Ignored unless tpu_native_arch is set.
    tpu_native_stem = 'patchify'
    # TPU-native refined-PoG readout: 'heatmap' (reference semantics —
    # soft-argmax of the refined heatmap IS the final estimate) or
    # 'gated' (residual readout: the final estimate is the INITIAL
    # estimate plus a learned, per-frame sigmoid-gated step toward the
    # heatmap's soft-argmax plus a learned sub-bin px correction, all
    # predicted from the decoder features). Motivation: the refined
    # estimate re-read off a 128x72 heatmap has a measured ~55-80 px
    # representational floor on this protocol (BASELINE.md staged study +
    # decode ablation) — when the initial estimate is ALREADY below that
    # floor, heatmap readout can only drag it back up. The gated readout
    # is initialized at gate~0 (final == initial) so refinement provably
    # starts from "never hurts" and must EARN its correction; the
    # heatmap, CE loss, and every output/metric name are unchanged.
    # Ignored unless tpu_native_arch is set.
    tpu_native_refine_head = 'heatmap'

    # Data-parallel mesh size; 0 = use all visible devices.
    tpu_num_devices = 0

    # Tensor parallelism: size of the 'model' mesh axis. Parameters with
    # large output-feature dims (and their Adam moments) shard over it
    # (eve_tpu/parallel/mesh.py:shard_model_tree); GSPMD inserts the
    # resharding collectives. 1 = off. EVE's ~11M params fit one chip, so
    # this is a scale-out capability, not a memory necessity
    # (tests/test_parallel.py pins 3D dp x tp x sp parity).
    tpu_model_parallelism = 1

    # Sequence parallelism: size of the 'seq' mesh axis. The temporal
    # recurrences run as a distributed scan with the carry hopping
    # between shards over ICI (eve_tpu/parallel/temporal.py); the batched
    # CNN stages shard over the same axis for free. Use when batch*T
    # exceeds per-chip HBM (long clips): the recurrence itself gets
    # SLOWER under sharding (BASELINE.md "Temporal-sharding overhead").
    # Must divide max_sequence_len. 1 = off.
    tpu_sequence_shards = 1

    # Multi-host: initialize the JAX distributed runtime at script start
    # (jax.distributed.initialize). On TPU pods the coordinator/world
    # size/rank auto-detect — leave the fields below empty; set them
    # explicitly for CPU/GPU clusters. After init, the harness slices the
    # clip list per host and assembles global batches
    # (eve_tpu/parallel/mesh.py:initialize_multihost).
    tpu_multihost = False
    tpu_coordinator_address = ''
    tpu_num_processes = 0
    tpu_process_id = -1

    # Rematerialize CNN activations in the backward pass (jax.checkpoint):
    # trades one extra forward of FLOPs for much lower activation memory,
    # enabling larger batch*sequence per chip. Granularity:
    # 'none' | 'eye' (ResNet features only) | 'refine' (refine encoder
    # only) | 'all'.
    tpu_remat = 'none'

    # Persistent XLA compilation cache directory ('' disables). Restarted
    # jobs — preemption auto-resume cycles in particular — skip the
    # multi-10s model compile. XLA keys entries by hardware + software
    # version; point it at per-fleet storage (identical machines), not a
    # directory shared across heterogeneous hosts.
    tpu_compile_cache_dir = ''

    # Write periodic checkpoints on a background thread: the state is
    # snapshotted to host memory synchronously (so the bytes are exactly
    # this step's state) and serialization/disk IO overlap training.
    # A blocking save of the flagship state costs seconds (BASELINE.md
    # "Checkpoint save cost") — at the reference's 100-step cadence
    # that is a double-digit share of training wall-clock. Preemption and
    # final checkpoints always complete before exit. Off = reference-style
    # blocking saves.
    tpu_async_checkpoint = True

    # Data echoing: step the optimizer N times per LOADED batch (each step
    # re-draws the kappa-augmentation stream). When the host input
    # pipeline is the bottleneck — measured at ~1% of the device compute
    # ceiling on 1-core hosts (BASELINE.md "Host-pipeline scaling") — this
    # multiplies device utilization at the cost of sample diversity
    # (arXiv:1907.05550 reports ~same quality up to small factors).
    train_batch_echoing = 1

    # Gradient accumulation: split each optimizer step over N sequential
    # micro-batches (the loader yields batch_size / N clips at a time) so
    # the EFFECTIVE batch stays batch_size while peak activation memory
    # drops by ~N. Matches one fused step on the full batch up to
    # reduction order.
    gradient_accumulation_steps = 1

    # Streaming inference: carry recurrent state across consecutive clips of
    # the input video (inference.py) instead of resetting per clip.
    inference_streaming = False

    # Ship uint8 frames to the device and normalize there (XLA-resident
    # preprocessing): 4x less host->device traffic and less HBM read at the
    # model entry. Off = reference-style host float32 normalization.
    tpu_on_device_preprocess = False

    # Directory for jax.profiler traces ('' disables).
    profile_dir = ''

    # AOT export (export_model.py): output path for the self-contained
    # .eve artifact, its fixed batch size, and whether it carries
    # recurrent state across chunks (streaming signature).
    export_path = ''
    export_batch_size = 1
    export_streaming = False

    # HTTP serving (serve.py): bind address/port and micro-batching knobs.
    # Requests are gathered for up to serve_max_delay_ms (or until
    # serve_max_batch are pending) and run as one padded device step.
    serve_host = '127.0.0.1'
    serve_port = 8000
    serve_max_batch = 8
    serve_max_delay_ms = 5.0
    # Backpressure: pending requests beyond serve_max_queue are rejected
    # (HTTP 429); bodies over serve_max_body_mb are rejected before the read
    # (HTTP 413); requests older than serve_request_timeout_s fail instead
    # of occupying batch slots.
    serve_max_queue = 64
    serve_max_body_mb = 256
    serve_request_timeout_s = 30.0
    # Bound on concurrently open sessions (each holds recurrent-state
    # arrays on the host); opens beyond it are refused.
    serve_max_sessions = 1024
    # Sessions idle longer than this are evicted when a new session opens
    # (0 disables; floored at 2x serve_request_timeout_s so an in-flight
    # chunk's session never ages out). Prevents clients that open
    # sessions and vanish from leaking slots until the serve_max_sessions
    # cap refuses every new stream.
    serve_session_ttl_s = 600.0
    # Data-parallel serving: shard each dispatched micro-batch over this
    # many chips (1-D 'data' mesh; params replicate). 0/1 = one device.
    # serve_max_batch must divide by it.
    serve_num_devices = 0
    # Serve from a self-contained AOT export (.eve artifact,
    # export_model.py) instead of model code + checkpoint; fixes one input
    # signature and the batch size. Empty = build the model from
    # --resume-from / $EVE_PRETRAINED_DIR as usual.
    serve_artifact = ''
    # Keep per-session recurrent state in device memory and assemble
    # micro-batches inside the jitted step: removes the per-chunk
    # device->host->device round trip of session state (~100 KB/chunk at
    # the flagship shapes). Measured compute-bound on-device path:
    # BASELINE.md "Serving engine loopback". Composes with
    # serve_num_devices (batch slots shard over the data mesh while each
    # session's state stays in device memory replicated across it);
    # incompatible with serve_artifact only.
    serve_device_resident = False

    # Per-submodule optimizer settings: multiply the LR schedule for the
    # matching top-level parameter subtree. This expresses the reference's
    # multi-optimizer list capability (src/core/training.py:474-502)
    # specialized to disjoint parameter sets — one Adam per subtree with
    # its own LR — as a single optax.multi_transform chain (gradient
    # clipping stays GLOBAL across subtrees, as the reference clips
    # model.parameters() once). 1.0 = shared optimizer (identical
    # optimizer-state layout to previous releases); any other value
    # changes the opt-state pytree, so optimizer state does not resume
    # across a multiplier change (model params are unaffected).
    eye_net_learning_rate_multiplier = 1.0
    refine_net_learning_rate_multiplier = 1.0

    # Reference-compat switches: replicate reference quirks bit-for-bit
    # (LambdaLR absolute-vs-factor LR mixup; CLSTM bottleneck output discard).
    # See SURVEY.md section 7 "Hard parts" item 4.
    reference_compat_lr_schedule = False
    reference_compat_clstm_carry_only = True

    # Host data pipeline
    prefetch_buffer_size = 2
    use_native_framepack = True

    # Decode-once packed-frame disk cache for the windowed training path
    # (eve_tpu/data/framecache.py). The reference re-decodes every window
    # from its mp4 every epoch (src/datasources/common.py:50-120); with
    # decode profiled at ~61% of warmed host item cost (BASELINE.md
    # "Host-pipeline scaling"), all epochs after the first were pure
    # waste. When set, each decoded window's uint8 frames + timestamps
    # are written once under this directory (content-keyed by video
    # path/mtime/size/indices, atomic writes, corrupt entries re-decoded)
    # and later epochs read from disk instead of the codec. '' disables.
    frame_cache_dir = ''
    # Disk budget for frame_cache_dir in GiB; least-recently-written
    # entries are evicted beyond it (checked at attach + every 256
    # writes).
    frame_cache_gb = 20.0

    # ------------------------------------------------------------------
    # Machinery (singleton, imports, provenance)
    # ------------------------------------------------------------------

    __instance = None

    def __new__(cls):
        if cls.__instance is None:
            cls.__instance = super().__new__(cls)
            cls.__filecontents = cls.__get_config_file_contents()
            cls.__immutable = True
        return cls.__instance

    @classmethod
    def _reset_instance_for_testing(cls):
        """Drop the singleton (tests only)."""
        cls.__instance = None

    def import_json(self, json_path, strict=True):
        """Import a JSON config file, overriding existing entries."""
        assert os.path.isfile(json_path)
        logger.info('Loading %s', json_path)
        with open(json_path, 'r') as f:
            json_string = f.read()
        self.import_dict(json.loads(json_string), strict=strict)
        # Provenance: two imported files may share a basename (unlike the
        # reference, multiple JSON imports are supported) — disambiguate so
        # the run's configs/ dir records every file.
        filecontents = self.__class__.__filecontents
        name = os.path.basename(json_path)
        if name in filecontents and filecontents[name] != json_string:
            stem, ext = os.path.splitext(name)
            i = 2
            while '%s.%d%s' % (stem, i, ext) in filecontents:
                i += 1
            name = '%s.%d%s' % (stem, i, ext)
        filecontents[name] = json_string

    def override(self, key, value):
        self.__class__.__immutable = False
        try:
            setattr(self, key, value)
        finally:
            self.__class__.__immutable = True

    def import_dict(self, dictionary, strict=True):
        """Import key/value pairs, with strict type agreement checks."""
        self.__class__.__immutable = False
        try:
            for key, value in dictionary.items():
                if strict:
                    if not hasattr(self, key):
                        raise ValueError('Unknown configuration key: ' + key)
                    if key == 'tpu_remat':
                        # Was a bool through round 1; old JSONs (incl.
                        # run-provenance combined.json) and truthy CLI
                        # spellings must keep working, and typos must fail
                        # loudly instead of silently meaning 'none'.
                        value = _normalize_remat(value)
                    if type(getattr(self, key)) is float and type(value) is int:
                        value = float(value)
                    else:
                        if type(getattr(self, key)) is not type(value):
                            raise TypeError(
                                'Type mismatch for key "%s": expected %s, got %s'
                                % (key, type(getattr(self, key)).__name__,
                                   type(value).__name__))
                    if not isinstance(getattr(DefaultConfig, key, None), property):
                        setattr(self, key, value)
                else:
                    if hasattr(DefaultConfig, key):
                        if not isinstance(getattr(DefaultConfig, key), property):
                            setattr(self, key, value)
                    else:
                        setattr(self, key, value)
        finally:
            self.__class__.__immutable = True

    @staticmethod
    def __get_config_file_contents():
        out = {}
        path = os.path.abspath(__file__)
        with open(path, 'r') as f:
            out[os.path.basename(path)] = f.read()
        return out

    def get_all_key_values(self):
        return dict([
            (key, getattr(self, key))
            for key in dir(self)
            if not key.startswith('_DefaultConfig')
            and not key.startswith('__')
            and not callable(getattr(self, key))
        ])

    def get_full_json(self):
        return json.dumps(self.get_all_key_values(), indent=4)

    def write_file_contents(self, target_base_dir):
        """Write config provenance (combined.json + sources zip) to a run dir."""
        assert os.path.isdir(target_base_dir)
        target_dir = os.path.join(target_base_dir, 'configs')
        os.makedirs(target_dir, exist_ok=True)
        outputs = {'combined.json': self.get_full_json()}
        outputs.update(self.__class__.__filecontents)
        for fname, content in outputs.items():
            fpath = os.path.join(target_dir, fname)
            with open(fpath, 'w') as f:
                f.write(content)
            logger.info('Written %s', fpath)

        # Zip up all framework sources for provenance
        target_path = os.path.join(target_base_dir, 'src.zip')
        source_path = os.path.dirname(os.path.abspath(__file__))
        with zipfile.ZipFile(target_path, 'w', zipfile.ZIP_DEFLATED) as zf:
            for pattern in ('/**/*.py', '/**/*.json', '/**/*.cpp'):
                for full_path in glob.glob(source_path + pattern, recursive=True):
                    if os.path.isfile(full_path):
                        zf.write(full_path,
                                 os.path.relpath(full_path,
                                                 os.path.dirname(source_path)))
            main_script = os.path.abspath(sys.argv[0]) if sys.argv else None
            if main_script and os.path.isfile(main_script) \
                    and main_script.endswith('.py'):
                zf.write(main_script, os.path.basename(main_script))
        logger.info('Written source folder to %s', target_path)

    def __setattr__(self, name, value):
        if self.__class__.__immutable:
            raise AttributeError('DefaultConfig instance attributes are immutable.')
        if name == 'video_decoder_codec' and value not in ('libx264', ''):
            # The reference honors nvdec/h264_cuvid GPU decode
            # (src/datasources/common.py:112-117); TPU hosts have no NVDEC,
            # so eve_tpu always decodes on the host CPU (SURVEY.md
            # section 2.2). Warn instead of silently ignoring the request.
            logger.warning(
                "video_decoder_codec=%r is not supported on TPU hosts; "
                "frames are decoded on the host CPU (cv2/ffmpeg, libx264 "
                "path). The key is accepted for reference-config "
                "compatibility only.", value)
        super().__setattr__(name, value)

    def __delattr__(self, name):
        if self.__class__.__immutable:
            raise AttributeError('DefaultConfig instance attributes are immutable.')
        super().__delattr__(name)
