"""Twenty-ninth bank of CLI tools: nnetbin multistream training +
learning-rate control, the sgmm2bin tail (EBW, signed-posterior
stats, pre-transforms, projection, fMLLR, gpost speaker vectors,
threaded latgen, UBM init), and the nnet3bin tail (dense-target /
simple / image egs, looped + grammar latgen, batched x-vectors).

Canonical shapes mirrored (SURVEY.md §2.1 bins):
nnetbin/{nnet-train-multistream, nnet-train-multistream-perutt,
train-transitions, nnet-set-learnrate}.cc,
sgmm2bin/{sgmm2-est-ebw, sgmm2-acc-stats2, sgmm2-comp-prexform,
sgmm2-project, sgmm2-est-fmllr, sgmm2-est-spkvecs-gpost,
sgmm2-latgen-faster-parallel, init-ubm}.cc,
nnet3bin/{nnet3-get-egs-dense-targets, nnet3-get-egs-simple,
nnet3-latgen-faster-looped, nnet3-latgen-grammar,
nnet3-egs-augment-image, nnet3-egs-to-image,
nnet3-xvector-compute-batched}.cc.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from kaldi_tpu.cli.tools import tool, _load_hclg, _LatgenDecoder
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# nnetbin tail
# ---------------------------------------------------------------------------

def _nnet1_multistream(argv, name: str, perutt: bool):
    """Shared body of nnet-train-multistream{,-perutt}: N parallel
    utterance streams; each step consumes one chunk (or whole
    utterance) per stream, so consecutive minibatches mix speakers —
    the BPTT data-scheduling pattern of nnetbin, applied to the
    sigmoid DNN (sequential within a stream, shuffled across)."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaldi_tpu.am.nnet1 import SigmoidDnn, load_nnet1, save_nnet1
    po = ParseOptions(f"{name} [opts] <nnet1-in> <feats-rspec> "
                      "<pdf-ali-rspec> <nnet1-out>")
    po.register("num-streams", int, 4, "parallel utterance streams")
    po.register("batch-frames", int, 32,
                "frames pulled per stream per step")
    po.register("learning-rate", float, 0.5, "SGD lr")
    args = po.read(argv)
    params, hid_dims, num_pdfs, priors = load_nnet1(args[0])
    model = SigmoidDnn(tuple(int(h) for h in hid_dims), int(num_pdfs))
    ali_r = RandomAccessTableReader(args[2], holder="ivec")
    utts = []
    for key, m in SequentialTableReader(args[1], holder="mat"):
        if key not in ali_r:
            continue
        m = np.asarray(m, np.float32)
        a = np.asarray(ali_r[key], np.int32)
        T = min(len(m), len(a))
        utts.append((m[:T], a[:T]))
    if not utts:
        raise KaldiError(f"{name}: no matched utterances")
    tx = optax.sgd(po["learning-rate"])
    opt = tx.init(params)

    @jax.jit
    def step(p, o, f, t):
        def loss_fn(p):
            logp = model.apply({"params": p}, f[:, None, :])[:, 0]
            return -jnp.mean(jnp.take_along_axis(logp, t[:, None],
                                                 axis=-1))
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    S = min(po["num-streams"], len(utts))
    C = po["batch-frames"]
    # stream scheduler: stream s holds utterance queue s::S
    queues = [[utts[i] for i in range(s, len(utts), S)]
              for s in range(S)]
    cursors = [[0, 0] for _ in range(S)]        # (utt idx, frame pos)
    loss, n_steps = None, 0
    while True:
        fs, ts = [], []
        for s in range(S):
            ui, pos = cursors[s]
            if ui >= len(queues[s]):
                continue
            m, a = queues[s][ui]
            if perutt:
                fs.append(m)
                ts.append(a)
                cursors[s] = [ui + 1, 0]
            else:
                fs.append(m[pos:pos + C])
                ts.append(a[pos:pos + C])
                pos += C
                cursors[s] = ([ui + 1, 0] if pos >= len(m)
                              else [ui, pos])
        if not fs:
            break
        f = jnp.asarray(np.concatenate(fs))
        t = jnp.asarray(np.concatenate(ts))
        params, opt, loss = step(params, opt, f, t)
        n_steps += 1
    save_nnet1(args[3], jax.tree_util.tree_map(np.asarray, params),
               hid_dims, num_pdfs, priors)
    log.info("%s: %d streams, %d steps, final xent %.4f", name, S,
             n_steps, float(loss))
    return 0


@tool("nnet-train-multistream")
def nnet_train_multistream_tool(argv):
    """Multistream nnet1 training
    (nnetbin/nnet-train-multistream.cc)."""
    return _nnet1_multistream(argv, "nnet-train-multistream", False)


@tool("nnet-train-multistream-perutt")
def nnet_train_multistream_perutt_tool(argv):
    """Per-utterance multistream nnet1 training
    (nnetbin/nnet-train-multistream-perutt.cc)."""
    return _nnet1_multistream(argv, "nnet-train-multistream-perutt",
                              True)


@tool("train-transitions")
def train_transitions_tool(argv):
    """Re-estimate transition probabilities from alignments — the
    nnetbin spelling (nnetbin/train-transitions.cc)."""
    from kaldi_tpu.am.serialize import (read_transition_model,
                                        write_transition_model)
    from kaldi_tpu.core import io as kio
    po = ParseOptions("train-transitions <trans-model-in> <ali-rspec> "
                      "<trans-model-out>")
    args = po.read(argv)
    with kio.open_rxfilename(args[0]) as f:
        kio.init_kaldi_input_stream(f)
        tm = read_transition_model(f)
    counts = np.zeros(tm.num_transition_ids + 1)
    n = 0
    for _key, ali in SequentialTableReader(args[1], holder="ivec"):
        np.add.at(counts, np.asarray(ali, np.int64), 1.0)
        n += 1
    if n == 0:
        raise KaldiError("train-transitions: no alignments")
    tm.mle_update(counts)
    with kio.open_wxfilename(args[2]) as f:
        kio.init_kaldi_output_stream(f)
        write_transition_model(f, tm)
    log.info("train-transitions: %d alignments", n)
    return 0


@tool("nnet-set-learnrate")
def nnet_set_learnrate_tool(argv):
    """Set per-layer learning-rate factors on an nnet1
    (nnetbin/nnet-set-learnrate.cc): ':'-separated factors for
    [hidden1..hiddenN, output_affine]; 0 freezes a layer.
    nnet-train-frmshuff scales its gradients by them."""
    from kaldi_tpu.am.nnet1 import load_nnet1_full, save_nnet1
    po = ParseOptions("nnet-set-learnrate --coefs=1:1:0.1 <nnet1-in> "
                      "<nnet1-out>")
    po.register("coefs", str, "",
                "per-layer factors, ':'-separated (REQUIRED)")
    args = po.read(argv)
    if not po["coefs"]:
        raise KaldiError("nnet-set-learnrate: --coefs required")
    params, hid_dims, num_pdfs, priors, _old = load_nnet1_full(args[0])
    coefs = [float(x) for x in po["coefs"].split(":")]
    want = len(hid_dims) + 1
    if len(coefs) != want:
        raise KaldiError(f"nnet-set-learnrate: {len(coefs)} coefs for "
                         f"{want} layers")
    save_nnet1(args[1], params, hid_dims, num_pdfs, priors=priors,
               lr_factors=np.asarray(coefs, np.float32))
    log.info("nnet-set-learnrate: %s", coefs)
    return 0


# ---------------------------------------------------------------------------
# sgmm2bin tail
# ---------------------------------------------------------------------------

def _accumulate_sgmm2_weighted(model, feats: np.ndarray,
                               frames: List[List[Tuple[int, float]]]):
    """(num_accs, den_accs) from SIGNED pdf-level posteriors
    (sgmm2-acc-stats2): positive weights accumulate into num,
    negative into den (with |w|)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.sgmm2 import Sgmm2Accs, _frame_posteriors
    J, K, I = model.num_pdfs, model.num_substates, model.M.shape[0]
    D = model.dim

    def zero():
        return Sgmm2Accs(gamma=np.zeros((J, K, I)),
                         y=np.zeros((J, K, I, D)),
                         S=np.zeros((I, D)))
    num, den = zero(), zero()
    for t, frame in enumerate(frames):
        if t >= len(feats) or not frame:
            continue
        x = jnp.asarray(feats[t][None], jnp.float32)
        for j, wgt in frame:
            j = int(j)
            post, _n, xi = _frame_posteriors(
                model, x, jnp.asarray([j], np.int32), None)
            post = np.asarray(post, np.float64)[0]      # (K, I)
            xi0 = np.asarray(xi, np.float64)[0]          # (I, D)
            acc = num if wgt > 0 else den
            aw = abs(float(wgt))
            acc.gamma[j] += aw * post
            acc.y[j] += aw * post[:, :, None] * xi0[None]
            acc.S += aw * np.einsum("ki,id->id", post, xi0 * xi0)
            acc.tot_frames += aw
    return num, den


@tool("sgmm2-acc-stats2")
def sgmm2_acc_stats2_tool(argv):
    """Numerator/denominator SGMM2 stats from signed posteriors —
    the discriminative accumulation (sgmm2bin/sgmm2-acc-stats2.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.cli.tools_bank11 import _write_sgmm2_accs
    po = ParseOptions("sgmm2-acc-stats2 <trans-model> <sgmm2-in> "
                      "<feats-rspec> <post-rspec> <num-accs-out> "
                      "<den-accs-out>\nposteriors are tid-level and "
                      "signed (lattice-to-post − alignment)")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    posts = RandomAccessTableReader(args[3], holder="post")
    num_tot = den_tot = None
    n = 0
    for key, feats in SequentialTableReader(args[2], holder="mat"):
        if key not in posts:
            continue
        pdf_frames = [[(int(tm.tid_to_pdf_array[int(t)]), w)
                       for t, w in frame] for frame in posts[key]]
        num, den = _accumulate_sgmm2_weighted(
            model, np.asarray(feats, np.float64), pdf_frames)
        num_tot = num if num_tot is None else num_tot + num
        den_tot = den if den_tot is None else den_tot + den
        n += 1
    if num_tot is None:
        raise KaldiError("sgmm2-acc-stats2: no utterances")
    _write_sgmm2_accs(args[4], num_tot)
    _write_sgmm2_accs(args[5], den_tot)
    log.info("sgmm2-acc-stats2: %d utterances (num %.1f / den %.1f "
             "frames)", n, num_tot.tot_frames, den_tot.tot_frames)
    return 0


@tool("sgmm2-est-ebw")
def sgmm2_est_ebw_tool(argv):
    """Discriminative (EBW) SGMM2 update from num/den stats
    (sgmm2bin/sgmm2-est-ebw.cc): per-substate vectors solve
    (H_num − H_den + D·I) v' = g_num − g_den + D·v with D grown until
    SPD; substate weights get the standard EBW floor-and-renormalize."""
    from kaldi_tpu.am.sgmm2 import Sgmm2, read_sgmm2, write_sgmm2
    from kaldi_tpu.cli.tools_bank11 import _read_sgmm2_accs
    po = ParseOptions("sgmm2-est-ebw [opts] <sgmm2-in> <num-accs> "
                      "<den-accs> <sgmm2-out>")
    po.register("tau-v", float, 10.0, "smoothing count for vectors")
    po.register("ebw-e", float, 2.0, "E constant (D = E·γ_den + τ)")
    po.register("tau-c", float, 5.0, "smoothing for substate weights")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    num = _read_sgmm2_accs(args[1], model.num_pdfs)
    den = _read_sgmm2_accs(args[2], model.num_pdfs)
    J, K, S = model.V.shape
    # MᵀΣ⁻¹ with the model's actual covariances (full or diag)
    if model.Sigma is not None:
        P, _ = model.precision()
        MtP = np.einsum("idr,ide->ire", model.M, P)      # (I, S, D)
    else:
        MtP = np.einsum("idr,id->ird", model.M, 1.0 / model.var)
    Hn = np.einsum("jki,ire,ies->jkrs", num.gamma, MtP, model.M)
    Hd = np.einsum("jki,ire,ies->jkrs", den.gamma, MtP, model.M)
    gn = np.einsum("ire,jkie->jkr", MtP, num.y)
    gd = np.einsum("ire,jkie->jkr", MtP, den.y)
    V = model.V.copy()
    occ_num = num.gamma.sum(axis=2)
    occ_den = den.gamma.sum(axis=2)
    n_upd = 0
    for j in range(J):
        for k in range(K):
            if occ_num[j, k] < 1e-3:
                continue
            Dk = po["ebw-e"] * occ_den[j, k] + po["tau-v"]
            for _ in range(12):
                A = Hn[j, k] - Hd[j, k] + Dk * np.eye(S)
                try:
                    L = np.linalg.cholesky(A)
                    break
                except np.linalg.LinAlgError:
                    Dk *= 2.0
            else:
                continue
            b = gn[j, k] - gd[j, k] + Dk * V[j, k]
            V[j, k] = np.linalg.solve(A, b)
            n_upd += 1
    # substate weights: EBW-style smoothed count ratio
    cnt = occ_num - occ_den + po["tau-c"] * model.c
    cnt = np.where(model.c > 0, np.maximum(cnt, 1e-10), 0.0)
    c = cnt / np.maximum(cnt.sum(axis=1, keepdims=True), 1e-30)
    out = Sgmm2(M=model.M, w=model.w, var=model.var, V=V, c=c,
                N=model.N, Sigma=model.Sigma)
    write_sgmm2(args[3], out)
    impr_proxy = float(np.abs(V - model.V).mean())
    log.info("sgmm2-est-ebw: updated %d substate vectors, mean |Δv| "
             "%.4f", n_upd, impr_proxy)
    return 0


@tool("sgmm2-comp-prexform")
def sgmm2_comp_prexform_tool(argv):
    """Pre-transform making the model's global covariance identity
    and its global mean zero (sgmm2bin/sgmm2-comp-prexform.cc):
    A = W^(−1/2), b = −A·μ̄ where W = Σ p (diag(Σ_i) + μμᵀ) − μ̄μ̄ᵀ
    over all (state, substate, Gaussian) components, states weighted
    by the occs vector (uniform when absent)."""
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    from kaldi_tpu.core import io as kio
    po = ParseOptions("sgmm2-comp-prexform <sgmm2-in> "
                      "[<occs-rxfilename>] <xform-out>")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    occs_path = args[1] if len(args) > 2 else ""
    out_path = args[-1]
    J = model.num_pdfs
    if occs_path:
        with kio.open_rxfilename(occs_path) as f:
            kio.init_kaldi_input_stream(f)
            state_p = np.asarray(kio.read_vector(f), np.float64)
        state_p = state_p / max(state_p.sum(), 1e-30)
    else:
        state_p = np.full(J, 1.0 / J)
    # p_jki = P(j)·c_jk·w_jki
    w = np.exp(model.log_weights())                 # (J, K, I)
    p = state_p[:, None, None] * model.c[:, :, None] * w
    p = p / max(p.sum(), 1e-30)
    mu = model.means()                              # (J, K, I, D)
    mbar = np.einsum("jki,jkid->d", p, mu)
    pi = p.sum(axis=(0, 1))                         # (I,)
    W = (np.einsum("i,id->d", pi, model.var) * np.eye(model.dim)
         + np.einsum("jki,jkid,jkie->de", p, mu, mu)
         - np.outer(mbar, mbar))
    evals, evecs = np.linalg.eigh(W)
    A = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 1e-8))) \
        @ evecs.T
    b = -A @ mbar
    xform = np.concatenate([A, b[:, None]], axis=1)
    with kio.open_wxfilename(out_path) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, xform)
    log.info("sgmm2-comp-prexform: |mean| %.3f → 0, cov eigs "
             "[%.2f, %.2f] → 1", float(np.abs(mbar).max()),
             float(evals.min()), float(evals.max()))
    return 0


@tool("sgmm2-project")
def sgmm2_project_tool(argv):
    """Apply a linear feature transform to an SGMM2: M' = T·M,
    N' = T·N, Σ' = diag(T·diag(Σ)·Tᵀ) (sgmm2bin/sgmm2-project.cc;
    the diagonal approximation of the projected covariance is
    documented — the reference keeps full covariances here)."""
    from kaldi_tpu.am.sgmm2 import Sgmm2, read_sgmm2, write_sgmm2
    from kaldi_tpu.core import io as kio
    po = ParseOptions("sgmm2-project <sgmm2-in> <xform-rxfilename> "
                      "<sgmm2-out>")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        T = np.asarray(kio.read_matrix(f), np.float64)
    D = model.dim
    if T.shape[1] == D + 1:
        T = T[:, :D]                    # offsets don't apply to M
    if T.shape[1] != D:
        raise KaldiError(f"sgmm2-project: transform cols {T.shape[1]} "
                         f"vs dim {D}")
    M2 = np.einsum("ed,ids->ies", T, model.M)
    N2 = (None if model.N is None
          else np.einsum("ed,idu->ieu", T, model.N))
    var2 = np.einsum("ed,id,fd->ief", T, model.var, T)
    var2 = np.maximum(np.diagonal(var2, axis1=1, axis2=2), 1e-6)
    out = Sgmm2(M=M2, w=model.w, var=var2, V=model.V, c=model.c,
                N=N2)
    write_sgmm2(args[2], out)
    log.info("sgmm2-project: dim %d → %d", D, T.shape[0])
    return 0


@tool("sgmm2-est-fmllr")
def sgmm2_est_fmllr_tool(argv):
    """Per-speaker fMLLR with SGMM2 expected statistics
    (sgmm2bin/sgmm2-est-fmllr.cc): the Gaussian posteriors, means and
    shared variances of the aligned state feed the standard fMLLR
    accumulator."""
    import jax.numpy as jnp
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import _frame_posteriors, read_sgmm2
    from kaldi_tpu.am.transforms import FmllrAccs
    po = ParseOptions("sgmm2-est-fmllr [--spk2utt=rspec] "
                      "<trans-model> <sgmm2-in> <feats-rspec> "
                      "<ali-rspec> <trans-wspec>")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    feats_r = RandomAccessTableReader(args[2], holder="mat")
    ali_r = RandomAccessTableReader(args[3], holder="ivec")
    groups: Dict[str, List[str]] = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"],
                                               holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[2], holder="mat"):
            groups[key] = [key]
    means = model.means()                           # (J, K, I, D)
    inv = 1.0 / model.var                           # (I, D)
    K, I = model.num_substates, model.M.shape[0]
    n = 0
    with TableWriter(args[4], holder="mat") as w:
        for spk, utts in groups.items():
            accs = FmllrAccs(model.dim)
            got = False
            for u in utts:
                if u not in feats_r or u not in ali_r:
                    continue
                x = np.asarray(feats_r[u], np.float64)
                tids = np.asarray(ali_r[u], np.int64)
                pdfs = tm.tid_to_pdf_array[tids]
                T = min(len(x), len(pdfs))
                post, _n, _xi = _frame_posteriors(
                    model, jnp.asarray(x[:T], jnp.float32),
                    jnp.asarray(pdfs[:T], np.int32), None)
                post = np.asarray(post, np.float64)  # (T, K, I)
                mu = means[pdfs[:T]]                 # (T, K, I, D)
                accs.accumulate(
                    post.reshape(T, K * I), x[:T],
                    mu.reshape(T, K * I, -1),
                    np.broadcast_to(inv[None, None], mu.shape
                                    ).reshape(T, K * I, -1))
                got = True
            if not got:
                continue
            W, impr = accs.update()
            w[spk] = W.astype(np.float32)
            n += 1
            log.info("sgmm2-est-fmllr: spk %s impr %.4f/frame over "
                     "%.0f frames", spk, impr, accs.beta)
    log.info("sgmm2-est-fmllr: %d speakers", n)
    return 0


@tool("sgmm2-est-spkvecs-gpost")
def sgmm2_est_spkvecs_gpost_tool(argv):
    """Speaker vectors from SGMM2 Gaussian-level posteriors
    (sgmm2bin/sgmm2-est-spkvecs-gpost.cc; gpost ids are flattened
    pdf·(K·I) + k·I + i from sgmm2-post-to-gpost).  The gpost pins
    the state sequence; the MAP solve is the same normal equation as
    sgmm2-est-spkvecs."""
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    po = ParseOptions("sgmm2-est-spkvecs-gpost [--spk2utt=rspec] "
                      "<sgmm2-in> <feats-rspec> <gpost-rspec> "
                      "<vecs-wspec>")
    po.register("spk2utt", str, "", "speaker→utterances map")
    args = po.read(argv)
    model = read_sgmm2(args[0])
    if model.N is None:
        raise KaldiError("sgmm2-est-spkvecs-gpost: no speaker "
                         "subspace")
    feats_r = RandomAccessTableReader(args[1], holder="mat")
    gpost_r = RandomAccessTableReader(args[2], holder="post")
    groups: Dict[str, List[str]] = {}
    if po["spk2utt"]:
        for spk, utts in SequentialTableReader(po["spk2utt"],
                                               holder="text"):
            groups[spk] = list(utts)
    else:
        for key, _ in SequentialTableReader(args[1], holder="mat"):
            groups[key] = [key]
    K, I = model.num_substates, model.M.shape[0]
    U = model.N.shape[2]
    means = model.means()
    inv = 1.0 / model.var
    NtSi = np.einsum("idu,id->idu", model.N, inv)
    H_base = np.einsum("idu,idv->iuv", NtSi, model.N)
    n = 0
    with TableWriter(args[3], holder="vec") as w:
        for spk, utts in groups.items():
            g = np.zeros(U)
            gi = np.zeros(I)
            got = False
            for u in utts:
                if u not in feats_r or u not in gpost_r:
                    continue
                x = np.asarray(feats_r[u], np.float64)
                for t, frame in enumerate(gpost_r[u]):
                    if t >= len(x):
                        break
                    for gid, wgt in frame:
                        gid = int(gid)
                        j, rem = divmod(gid, K * I)
                        k, i = divmod(rem, I)
                        resid = x[t] - means[j, k, i]
                        g += wgt * NtSi[i].T @ resid
                        gi[i] += wgt
                got = True
            if not got:
                continue
            H = np.eye(U) + np.einsum("i,iuv->uv", gi, H_base)
            w[spk] = np.linalg.solve(H, g).astype(np.float32)
            n += 1
    log.info("sgmm2-est-spkvecs-gpost: %d speakers", n)
    return 0


@tool("sgmm2-latgen-faster-parallel")
def sgmm2_latgen_faster_parallel_tool(argv):
    """Threaded SGMM2 lattice decoding
    (sgmm2bin/sgmm2-latgen-faster-parallel.cc)."""
    from concurrent.futures import ThreadPoolExecutor
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    po = ParseOptions("sgmm2-latgen-faster-parallel [opts] "
                      "<trans-model> <sgmm2-in> <fst> <feats-rspec> "
                      "<lattice-wspec>")
    po.register("beam", float, 13.0, "decoding beam")
    po.register("lattice-beam", float, 6.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("num-threads", int, 4, "host worker threads")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    model = read_sgmm2(args[1])
    HCLG = _load_hclg(args[2])
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])

    def one(item):
        key, feats = item
        ll = np.asarray(model.loglikes(np.asarray(feats)), np.float32)
        return key, dec.decode_to_clat(ll)

    entries = list(SequentialTableReader(args[3], holder="mat"))
    with ThreadPoolExecutor(max_workers=po["num-threads"]) as pool:
        results = list(pool.map(one, entries))
    with TableWriter(args[4], holder="clat") as w:
        for key, clat in results:
            w[key] = clat
    log.info("sgmm2-latgen-faster-parallel: %d utterances on %d "
             "threads", len(results), po["num-threads"])
    return 0


@tool("init-ubm")
def init_ubm_tool(argv):
    """Cluster a trained AM's Gaussians down to a UBM
    (sgmm2bin/init-ubm.cc): occupancy-weighted k-means over the
    Gaussian means, variances pooled per cluster; output feeds
    sgmm2-init / ivector training as the global background model."""
    from kaldi_tpu.am.gmm import AmDiagGmm
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank5 import _write_global_gmm
    from kaldi_tpu.core import io as kio
    po = ParseOptions("init-ubm [opts] <model-in> <occs-rxfilename> "
                      "<ubm-out>")
    po.register("ubm-num-gauss", int, 8, "UBM Gaussians")
    po.register("num-iters", int, 5, "weighted k-means iterations")
    args = po.read(argv)
    _tm, am = read_mdl(args[0])
    with kio.open_rxfilename(args[1]) as f:
        kio.init_kaldi_input_stream(f)
        occs = np.asarray(kio.read_vector(f), np.float64)
    if len(occs) != am.num_pdfs:
        raise KaldiError(f"init-ubm: {len(occs)} occs vs "
                         f"{am.num_pdfs} pdfs")
    # flatten (pdf, mix) with weight occ_pdf · w_mix
    wts = (occs[:, None] * am.weights).reshape(-1)
    mus = am.means.reshape(-1, am.dim)
    vrs = am.vars.reshape(-1, am.dim)
    keep = wts > 0
    wts, mus, vrs = wts[keep], mus[keep], vrs[keep]
    M = min(po["ubm-num-gauss"], len(mus))
    # init centers at the heaviest Gaussians
    order = np.argsort(-wts)[:M]
    centers = mus[order].copy()
    assign = None
    for _ in range(po["num-iters"]):
        d2 = ((mus[:, None, :] - centers[None]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for m in range(M):
            sel = assign == m
            if wts[sel].sum() > 0:
                centers[m] = np.average(mus[sel], axis=0,
                                        weights=wts[sel])
    uw = np.zeros(M)
    umu = np.zeros((M, am.dim))
    uvar = np.zeros((M, am.dim))
    for m in range(M):
        sel = assign == m
        wm = wts[sel].sum()
        uw[m] = wm
        if wm > 0:
            umu[m] = np.average(mus[sel], axis=0, weights=wts[sel])
            # pooled second moment around the cluster center
            uvar[m] = np.average(vrs[sel] + (mus[sel] - umu[m]) ** 2,
                                 axis=0, weights=wts[sel])
        else:
            umu[m] = centers[m]
            uvar[m] = 1.0
    uw = uw / max(uw.sum(), 1e-30)
    ubm = AmDiagGmm(uw[None, :], umu[None], np.maximum(uvar, 1e-4)[None])
    _write_global_gmm(args[2], ubm)
    log.info("init-ubm: %d Gaussians ← %d (pdf, mix) components", M,
             len(mus))
    return 0


# ---------------------------------------------------------------------------
# nnet3bin tail
# ---------------------------------------------------------------------------

@tool("nnet3-get-egs-dense-targets")
def nnet3_get_egs_dense_targets_tool(argv):
    """Chunked egs with DENSE float targets
    (nnet3bin/nnet3-get-egs-dense-targets.cc): regression/soft-label
    training examples."""
    from kaldi_tpu.pipelines.egs_io import DenseEg
    po = ParseOptions("nnet3-get-egs-dense-targets [--chunk-size=64] "
                      "<feats-rspec> <targets-rspec> <egs-wspec>")
    po.register("chunk-size", int, 64, "frames per chunk")
    args = po.read(argv)
    T = po["chunk-size"]
    tgt_r = RandomAccessTableReader(args[1], holder="mat")
    n = 0
    with TableWriter(args[2], holder="dteg") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in tgt_r:
                log.warning("nnet3-get-egs-dense-targets: no targets "
                            "for %s", key)
                continue
            feats = np.asarray(feats, np.float32)
            tgts = np.asarray(tgt_r[key], np.float32)
            if len(tgts) != len(feats):
                raise KaldiError(f"{key}: targets/feats length "
                                 "mismatch")
            for i, lo in enumerate(range(0, len(feats) - T + 1, T)):
                w[f"{key}-{i}"] = DenseEg(feats[lo:lo + T],
                                          tgts[lo:lo + T])
                n += 1
    log.info("nnet3-get-egs-dense-targets: %d egs", n)
    return 0


@tool("nnet3-get-egs-simple")
def nnet3_get_egs_simple_tool(argv):
    """Whole-utterance egs, no chunking
    (nnet3bin/nnet3-get-egs-simple.cc)."""
    from kaldi_tpu.pipelines.egs_io import XentEg
    po = ParseOptions("nnet3-get-egs-simple <feats-rspec> "
                      "<pdf-ali-rspec> <egs-wspec>")
    args = po.read(argv)
    ali_r = RandomAccessTableReader(args[1], holder="ivec")
    n = 0
    with TableWriter(args[2], holder="xeg") as w:
        for key, feats in SequentialTableReader(args[0], holder="mat"):
            if key not in ali_r:
                continue
            feats = np.asarray(feats, np.float32)
            pdfs = np.asarray(ali_r[key], np.int32)
            T = min(len(feats), len(pdfs))
            w[key] = XentEg(feats[:T][None], pdfs[:T][None])
            n += 1
    log.info("nnet3-get-egs-simple: %d egs", n)
    return 0


@tool("nnet3-egs-augment-image")
def nnet3_egs_augment_image_tool(argv):
    """Image augmentation on egs whose feature rows are images
    (nnet3bin/nnet3-egs-augment-image.cc): random horizontal shifts
    (zero-padded) and flips, labels unchanged."""
    from kaldi_tpu.pipelines.egs_io import XentEg
    po = ParseOptions("nnet3-egs-augment-image [opts] <egs-rspec> "
                      "<egs-wspec>")
    po.register("horizontal-shift", float, 0.1,
                "max |shift| as a fraction of width")
    po.register("horizontal-flip-prob", float, 0.0, "flip probability")
    po.register("srand", int, 0, "seed")
    args = po.read(argv)
    rng = np.random.default_rng(po["srand"])
    n = 0
    with TableWriter(args[1], holder="xeg") as w:
        for key, eg in SequentialTableReader(args[0], holder="xeg"):
            feats = np.asarray(eg.feats, np.float32).copy()
            W = feats.shape[-1]
            max_s = int(po["horizontal-shift"] * W)
            if max_s:
                s = int(rng.integers(-max_s, max_s + 1))
                feats = np.roll(feats, s, axis=-1)
                if s > 0:
                    feats[..., :s] = 0.0
                elif s < 0:
                    feats[..., s:] = 0.0
            if rng.random() < po["horizontal-flip-prob"]:
                feats = feats[..., ::-1].copy()
            w[key] = XentEg(feats, eg.pdfs)
            n += 1
    log.info("nnet3-egs-augment-image: %d egs augmented", n)
    return 0


@tool("nnet3-egs-to-image")
def nnet3_egs_to_image_tool(argv):
    """Unpack egs back to per-example feature matrices
    (nnet3bin/nnet3-egs-to-image.cc role: inspection/export)."""
    po = ParseOptions("nnet3-egs-to-image <egs-rspec> <mat-wspec>")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="mat") as w:
        for key, eg in SequentialTableReader(args[0], holder="xeg"):
            feats = np.asarray(eg.feats, np.float32)
            for b in range(feats.shape[0]):
                w[f"{key}-{b}" if feats.shape[0] > 1 else key] = \
                    feats[b]
                n += 1
    log.info("nnet3-egs-to-image: %d images", n)
    return 0


@tool("nnet3-latgen-faster-looped")
def nnet3_latgen_faster_looped_tool(argv):
    """Lattice decoding with LOOPED (chunked, state-carrying) acoustic
    scoring (nnet3bin/nnet3-latgen-faster-looped.cc): the TDNN scores
    --chunk-frames at a time with --extra-context frames of overlap —
    bounded activation memory for arbitrarily long utterances; with
    overlap ≥ the receptive field the scores equal the whole-utterance
    forward."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    po = ParseOptions("nnet3-latgen-faster-looped [opts] <trans-model> "
                      "<raw-nnet3> <fst> <feats-rspec> <lat-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("lattice-beam", float, 8.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("chunk-frames", int, 51,
                "frames scored per step (multiple of subsampling)")
    po.register("extra-context", int, 30,
                "overlap frames each side (≥ receptive field)")
    args = po.read(argv)
    tm, _am = read_mdl(args[0])
    sub = po["frame-subsampling-factor"]
    _cfg, fwd = _load_tdnn(args[1], sub)
    dec = _LatgenDecoder(_load_hclg(args[2]), tm.tid_to_pdf_array,
                         po["beam"], po["lattice-beam"],
                         po["acoustic-scale"],
                         max_active=po["max-active"])
    C = po["chunk-frames"] - po["chunk-frames"] % sub or sub
    ctx = po["extra-context"] - po["extra-context"] % sub

    def looped_scores(feats: np.ndarray) -> np.ndarray:
        T = len(feats)
        outs = []
        for lo in range(0, T, C):
            hi = min(lo + C, T)
            a = max(lo - ctx, 0)
            b = min(hi + ctx, T)
            win = fwd(feats[a:b][None])
            win = np.asarray(win)[0]
            s0 = (lo - a) // sub
            outs.append(win[s0:s0 + (hi - lo) // sub])
        return np.concatenate(outs)

    n = 0
    with TableWriter(args[4], holder="clat") as lw:
        for key, feats in SequentialTableReader(args[3], holder="mat"):
            scores = looped_scores(np.asarray(feats, np.float32))
            lw[key] = dec.decode_to_clat(scores)
            n += 1
    log.info("nnet3-latgen-faster-looped: %d utterances (chunk %d, "
             "context %d)", n, C, ctx)
    return 0


@tool("nnet3-latgen-grammar")
def nnet3_latgen_grammar_tool(argv):
    """Lattice decoding over a grammar FST: nonterminal sub-HCLGs are
    spliced into the top-level graph, then the standard latgen runs
    (nnet3bin/nnet3-latgen-grammar.cc; expansion via
    fst/grammar.py replace_nonterminals — the offline reading of the
    reference's lazily-expanded GrammarFst)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_bank3 import _load_tdnn
    from kaldi_tpu.cli.tools_extra import _load_fst
    from kaldi_tpu.fst.csr import csr_to_vector_fst, pack_fst
    from kaldi_tpu.fst.grammar import replace_nonterminals
    po = ParseOptions("nnet3-latgen-grammar [opts] <trans-model> "
                      "<raw-nnet3> <top-hclg> <nonterm-int1> "
                      "<sub-hclg1> [...] <feats-rspec> <lat-wspec>")
    po.register("beam", float, 15.0, "decoding beam")
    po.register("lattice-beam", float, 8.0, "lattice beam")
    po.register("max-active", int, 7000, "max active states")
    po.register("acoustic-scale", float, 1.0, "acoustic scale")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    if len(args) < 7 or (len(args) - 5) % 2:
        raise KaldiError("nnet3-latgen-grammar: need trans-model, "
                         "nnet, top, (nonterm, sub)+, feats, lats")
    tm, _am = read_mdl(args[0])
    _cfg, fwd = _load_tdnn(args[1], po["frame-subsampling-factor"])
    top = pack_fst(_load_fst(args[2]))
    subs = {}
    for i in range(3, len(args) - 2, 2):
        subs[int(args[i])] = pack_fst(_load_fst(args[i + 1]))
    HCLG = csr_to_vector_fst(replace_nonterminals(top, subs))
    dec = _LatgenDecoder(HCLG, tm.tid_to_pdf_array, po["beam"],
                         po["lattice-beam"], po["acoustic-scale"],
                         max_active=po["max-active"])
    n = 0
    with TableWriter(args[-1], holder="clat") as lw:
        for key, feats in SequentialTableReader(args[-2],
                                                holder="mat"):
            scores = np.asarray(
                fwd(np.asarray(feats, np.float32)[None]))[0]
            lw[key] = dec.decode_to_clat(scores)
            n += 1
    log.info("nnet3-latgen-grammar: %d utterances (%d nonterminals)",
             n, len(subs))
    return 0


@tool("nnet3-xvector-compute-batched")
def nnet3_xvector_compute_batched_tool(argv):
    """Batched x-vector extraction
    (nnet3bin/nnet3-xvector-compute-batched.cc contract): utterances
    are cut into fixed --chunk-size windows, windows from all
    utterances fill fixed-shape device batches (one compiled
    executable), and each utterance's embedding is the mean of its
    chunk embeddings."""
    import jax
    import jax.numpy as jnp
    from kaldi_tpu.am.xvector import load_xvector_model
    po = ParseOptions("nnet3-xvector-compute-batched [opts] "
                      "<model-in> <feats-rspec> <vec-wspec>")
    po.register("batch-size", int, 8, "windows per device batch")
    po.register("chunk-size", int, 100, "frames per window")
    args = po.read(argv)
    variables, model, _spks = load_xvector_model(args[0])
    C = po["chunk-size"]
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False,
                                        return_embedding=True))
    windows: List[Tuple[str, np.ndarray]] = []
    for key, m in SequentialTableReader(args[1], holder="mat"):
        m = np.asarray(m, np.float32)
        if len(m) <= C:
            win = np.zeros((C, m.shape[1]), np.float32)
            win[:len(m)] = m
            windows.append((key, win))
        else:
            for lo in range(0, len(m) - C + 1, C):
                windows.append((key, m[lo:lo + C]))
    if not windows:
        raise KaldiError("nnet3-xvector-compute-batched: no "
                         "utterances")
    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}
    B = po["batch-size"]
    for i in range(0, len(windows), B):
        chunk = windows[i:i + B]
        X = np.zeros((B, C, chunk[0][1].shape[1]), np.float32)
        for b, (_k, win) in enumerate(chunk):
            X[b] = win
        embs = np.asarray(fwd(jnp.asarray(X)))
        for b, (k, _win) in enumerate(chunk):
            sums[k] = sums.get(k, 0.0) + embs[b]
            counts[k] = counts.get(k, 0) + 1
    n = 0
    with TableWriter(args[2], holder="vec") as w:
        for k in sums:
            w[k] = (sums[k] / counts[k]).astype(np.float32)
            n += 1
    log.info("nnet3-xvector-compute-batched: %d utterances, %d "
             "windows", n, len(windows))
    return 0
