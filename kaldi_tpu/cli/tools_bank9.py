"""Ninth bank of CLI tools: training binaries, RNNLM, SGMM2, n-best
plumbing, transform estimation.

Canonical shapes mirrored: bin/convert-ali.cc, gmmbin/
gmm-decode-faster.cc, bin/{acc-lda,est-lda,gmm-acc-mllt,est-mllt}.cc,
latbin/{lattice-to-fst,nbest-to-linear,linear-to-nbest}.cc,
bin/make-h-transducer.cc, ivectorbin/ivector-extract-online.cc,
nnet3bin/nnet3-train.cc, chainbin/{nnet3-chain-train,
nnet3-chain-compute-prob}.cc, rnnlmbin (rnnlm-train role,
lattice-lmrescore-kaldi-rnnlm), sgmm2bin/{sgmm2-init,sgmm2-info,
sgmm2-copy}.cc, bin/{matrix-sum,vector-scale}.cc.
"""

from __future__ import annotations

from typing import List

import numpy as np

from kaldi_tpu.cli.tools import tool
from kaldi_tpu.core.logging import KaldiError, get_logger
from kaldi_tpu.core.options import ParseOptions
from kaldi_tpu.core.table import (RandomAccessTableReader,
                                  SequentialTableReader, TableWriter)

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# bin: alignments & transforms
# ---------------------------------------------------------------------------

@tool("convert-ali")
def convert_ali(argv):
    """Remap tid alignments onto a new model/tree (bin/convert-ali.cc:
    same phone sequence and HMM-state path, new pdf-ids)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.tri import convert_alignment
    po = ParseOptions("convert-ali <old-model> <new-model> <new-tree:"
                      "unused, tree travels inside the .mdl> "
                      "<ali-rspec> <ali-wspec>")
    args = po.read(argv)
    if len(args) == 5:          # kaldi arity (tree arg accepted, unused)
        old_mdl, new_mdl, _tree, rspec, wspec = args
    else:
        old_mdl, new_mdl, rspec, wspec = args
    tm_old, _ = read_mdl(old_mdl)
    tm_new, _ = read_mdl(new_mdl)
    cw = tm_new.tree.context_width
    cp = tm_new.tree.central_position
    n = 0
    with TableWriter(wspec, holder="ivec") as w:
        for key, ali in SequentialTableReader(rspec, holder="ivec"):
            w[key] = np.asarray(
                convert_alignment(tm_old, tm_new, ali.tolist(),
                                  context_width=cw, central_position=cp),
                np.int32)
            n += 1
    log.info("convert-ali: converted %d alignments", n)
    return 0


@tool("gmm-decode-faster")
def gmm_decode_faster(argv):
    """Best-path GMM decoding, words + alignment out (no lattice)."""
    import struct
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.decoder.dense import DenseDecoder, DenseDecoderConfig
    from kaldi_tpu.fst.fst import VectorFst
    po = ParseOptions("gmm-decode-faster [opts] <model> <fst> "
                      "<feats-rspec> <words-wspec> [<ali-wspec>]")
    po.register("beam", float, 16.0, "decoding beam")
    po.register("acoustic-scale", float, 0.1, "acoustic scale")
    po.register("word-symbol-table", str, "", "words.txt")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    with open(args[1], "rb") as fh:
        binary = fh.read(4) == struct.pack("<i", 2125659606)
    if binary:
        from kaldi_tpu.fst.openfst_io import read_fst_path
        fst = read_fst_path(args[1])
    else:
        fst = VectorFst.read_text(args[1])
    dec = DenseDecoder(fst, tm.tid_to_pdf_array,
                       DenseDecoderConfig(beam=po["beam"],
                                          acoustic_scale=po["acoustic-scale"]))
    words_tab = None
    if po["word-symbol-table"]:
        from kaldi_tpu.fst.fst import SymbolTable
        words_tab = SymbolTable.read(po["word-symbol-table"])
    awriter = (TableWriter(args[4], holder="ivec")
               if len(args) > 4 else None)
    n = 0
    with TableWriter(args[3], holder="text") as ww:
        for key, feats in SequentialTableReader(args[2], holder="mat"):
            ll = np.asarray(am.loglikes(np.asarray(feats)))
            tids, ols, cost = dec.decode(ll)
            ww[key] = [words_tab.find(o) if words_tab else str(o)
                       for o in ols]
            if awriter:
                awriter[key] = np.asarray(tids, np.int32)
            n += 1
    if awriter:
        awriter.close()
    log.info("gmm-decode-faster: decoded %d utterances", n)
    return 0


@tool("acc-lda")
def acc_lda(argv):
    """Accumulate LDA stats from pdf posteriors (bin/acc-lda.cc).
    Stats file: token-framed counts / first / second."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import LdaEstimate
    from kaldi_tpu.core import io as kio
    po = ParseOptions("acc-lda [opts] <trans-model> <feats-rspec> "
                      "<post-rspec> <acc-out>")
    po.register("rand-prune", float, 0.0, "posterior pruning floor")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    posts = RandomAccessTableReader(args[2], holder="post")
    lda = None
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in posts:
            continue
        feats = np.asarray(feats)
        if lda is None:
            lda = LdaEstimate(tm.num_pdfs, feats.shape[1])
        for t, frame in enumerate(posts[key]):
            for tid, wgt in frame:
                if wgt <= po["rand-prune"]:
                    continue
                lda.accumulate(feats[t], tm.transition_id_to_pdf(int(tid)),
                               float(wgt))
        n += 1
    if lda is None:
        raise KaldiError("acc-lda: no utterances accumulated")
    with kio.open_wxfilename(args[3]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<LDAACCS>")
        kio.write_matrix(f, lda.counts[None, :])
        kio.write_matrix(f, lda.first)
        kio.write_matrix(f, lda.total_second)
        kio.write_token(f, "</LDAACCS>")
    log.info("acc-lda: accumulated %d utterances", n)
    return 0


@tool("est-lda")
def est_lda(argv):
    """Estimate the LDA transform from acc-lda stats (bin/est-lda.cc)."""
    from kaldi_tpu.am.transforms import LdaEstimate
    from kaldi_tpu.core import io as kio
    po = ParseOptions("est-lda [opts] <lda-out> <acc1> [<acc2> ...]")
    po.register("dim", int, 40, "output feature dim")
    po.register("write-full-matrix", str, "",
                "also write the FULL (square) LDA matrix — consumed "
                "by get-full-lda-mat for raw-space fMLLR")
    args = po.read(argv)
    lda = None
    for acc in args[1:]:
        with kio.open_rxfilename(acc) as f:
            if not kio.init_kaldi_input_stream(f):
                raise KaldiError(f"{acc}: not binary kaldi")
            kio.expect_token(f, "<LDAACCS>")
            counts = kio.read_matrix(f)[0]
            first = kio.read_matrix(f)
            second = kio.read_matrix(f)
            kio.expect_token(f, "</LDAACCS>")
        if lda is None:
            lda = LdaEstimate(len(counts), first.shape[1])
        lda.counts += counts
        lda.first += first
        lda.total_second += second
    mat = lda.estimate(po["dim"])
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    if po["write-full-matrix"]:
        full_dim = lda.first.shape[1]
        full = lda.estimate(full_dim)
        with kio.open_wxfilename(po["write-full-matrix"]) as f:
            kio.init_kaldi_output_stream(f)
            kio.write_matrix(f, full)
    log.info("est-lda: wrote %dx%d transform", *mat.shape)
    return 0


@tool("gmm-acc-mllt")
def gmm_acc_mllt(argv):
    """Accumulate MLLT stats from aligned GMMs (bin/gmm-acc-mllt.cc)."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.transforms import MlltAccs
    from kaldi_tpu.core import io as kio
    po = ParseOptions("gmm-acc-mllt [opts] <model> <feats-rspec> "
                      "<ali-rspec> <acc-out>")
    args = po.read(argv)
    tm, am = read_mdl(args[0])
    alis = RandomAccessTableReader(args[2], holder="ivec")
    accs = None
    n = 0
    for key, feats in SequentialTableReader(args[1], holder="mat"):
        if key not in alis:
            continue
        feats = np.asarray(feats)
        if accs is None:
            accs = MlltAccs(feats.shape[1])
        pdfs = np.array([tm.transition_id_to_pdf(int(t))
                         for t in alis[key]], np.int32)
        post = np.asarray(am.component_posteriors(feats, pdfs))
        accs.accumulate(post, feats, am.means[pdfs],
                        1.0 / am.vars[pdfs])
        n += 1
    if accs is None:
        raise KaldiError("gmm-acc-mllt: no utterances accumulated")
    with kio.open_wxfilename(args[3]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_token(f, "<MLLTACCS>")
        kio.write_basic_float(f, accs.beta)
        for i in range(accs.G.shape[0]):
            kio.write_matrix(f, accs.G[i])
        kio.write_token(f, "</MLLTACCS>")
    log.info("gmm-acc-mllt: accumulated %d utterances", n)
    return 0


@tool("est-mllt")
def est_mllt(argv):
    """Estimate the MLLT/STC transform (bin/est-mllt.cc)."""
    from kaldi_tpu.am.transforms import MlltAccs
    from kaldi_tpu.core import io as kio
    po = ParseOptions("est-mllt <mllt-out> <acc1> [<acc2> ...]")
    args = po.read(argv)
    accs = None
    for acc in args[1:]:
        with kio.open_rxfilename(acc) as f:
            if not kio.init_kaldi_input_stream(f):
                raise KaldiError(f"{acc}: not binary kaldi")
            kio.expect_token(f, "<MLLTACCS>")
            beta = kio.read_basic_float(f)
            G0 = kio.read_matrix(f)
            D = G0.shape[0]
            G = np.empty((D, D, D))
            G[0] = G0
            for i in range(1, D):
                G[i] = kio.read_matrix(f)
            kio.expect_token(f, "</MLLTACCS>")
        if accs is None:
            accs = MlltAccs(D)
        accs.beta += beta
        accs.G += G
    mat, impr = accs.update()
    with kio.open_wxfilename(args[0]) as f:
        kio.init_kaldi_output_stream(f)
        kio.write_matrix(f, mat)
    log.info("est-mllt: objf impr %.4f/frame", impr)
    return 0


@tool("make-h-transducer")
def make_h_transducer_tool(argv):
    """Build Ha from the model's tree+topology (bin/make-h-transducer).
    The ilabel-info here is the monophone/1-window case unless an
    ilabel-info file (one phone-window per line) is given."""
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.cli.tools_extra import _save_fst
    from kaldi_tpu.fst.hclg import make_h_transducer
    po = ParseOptions("make-h-transducer [opts] <ilabel-info|'-'> "
                      "<model> <fst-out>")
    po.register("transition-scale", float, 1.0, "transition scale")
    po.register("self-loop-scale", float, 0.1, "self-loop scale "
                "(recorded; self-loops added by add-self-loops)")
    po.register("disambig-syms-out", str, "", "write disambig tids here")
    args = po.read(argv)
    tm, _ = read_mdl(args[1])
    if args[0] == "-":
        info = [(0,)] + [(p,) for p in tm.topo.phones]
        disambig_start = len(info)
    else:
        info = []
        with open(args[0]) as f:
            for line in f:
                info.append(tuple(int(x) for x in line.split()))
        disambig_start = len([i for i in info if not (len(i) == 1
                                                      and i[0] < 0)])
    ha, disambig_tids = make_h_transducer(
        info, tm, disambig_start,
        transition_scale=po["transition-scale"],
        self_loop_scale=po["self-loop-scale"])
    _save_fst(args[2], ha)
    if po["disambig-syms-out"]:
        with open(po["disambig-syms-out"], "w") as f:
            f.write("\n".join(str(t) for t in disambig_tids) + "\n")
    log.info("make-h-transducer: %d states, %d disambig tids",
             ha.num_states, len(disambig_tids))
    return 0


# ---------------------------------------------------------------------------
# latbin: n-best plumbing, lattice-to-fst
# ---------------------------------------------------------------------------

@tool("lattice-to-fst")
def lattice_to_fst(argv):
    """CompactLattice → weighted word acceptor (latbin/lattice-to-fst:
    costs scaled then combined into one tropical weight; alignments
    dropped)."""
    from kaldi_tpu.fst.fst import Arc, VectorFst
    po = ParseOptions("lattice-to-fst [opts] <lattice-rspec> <fsts-wspec>")
    po.register("lm-scale", float, 0.0, "LM cost scale")
    po.register("acoustic-scale", float, 0.0, "acoustic cost scale")
    args = po.read(argv)
    n = 0
    with TableWriter(args[1], holder="fst") as w:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            fst = VectorFst()
            for _ in range(clat.num_states):
                fst.add_state()
            if clat.start >= 0:
                fst.set_start(clat.start)
            for s, arcs in enumerate(clat.arcs):
                for a in arcs:
                    wgt = (po["lm-scale"] * a.graph_cost
                           + po["acoustic-scale"] * a.acoustic_cost)
                    fst.arcs[s].append(Arc(a.word, a.word, wgt,
                                           a.nextstate))
            for s, (gc, ac, _) in clat.finals.items():
                fst.set_final(s, po["lm-scale"] * gc
                              + po["acoustic-scale"] * ac)
            w[key] = fst
            n += 1
    log.info("lattice-to-fst: converted %d lattices", n)
    return 0


@tool("nbest-to-linear")
def nbest_to_linear(argv):
    """Single-path lattices (lattice-to-nbest output, keys utt-1..N) →
    alignment / words / lm-cost / acoustic-cost tables
    (latbin/nbest-to-linear.cc)."""
    po = ParseOptions("nbest-to-linear <nbest-rspec> <ali-wspec> "
                      "<words-wspec> [<lmcost-wspec> <accost-wspec>]")
    args = po.read(argv)
    lm_w = TableWriter(args[3], holder="text") if len(args) > 3 else None
    ac_w = TableWriter(args[4], holder="text") if len(args) > 4 else None
    n = 0
    with TableWriter(args[1], holder="ivec") as aw, \
            TableWriter(args[2], holder="text") as ww:
        for key, clat in SequentialTableReader(args[0], holder="clat"):
            words, tids, _cost = clat.best_path()
            lmc = sum(a.graph_cost for arcs in clat.arcs for a in arcs)
            acc = sum(a.acoustic_cost for arcs in clat.arcs for a in arcs)
            for gc, ac, _ in clat.finals.values():
                lmc += gc
                acc += ac
            aw[key] = np.asarray(tids, np.int32)
            ww[key] = [str(x) for x in words]
            if lm_w:
                lm_w[key] = [f"{lmc:.4f}"]
            if ac_w:
                ac_w[key] = [f"{acc:.4f}"]
            n += 1
    if lm_w:
        lm_w.close()
    if ac_w:
        ac_w.close()
    log.info("nbest-to-linear: %d paths", n)
    return 0


@tool("linear-to-nbest")
def linear_to_nbest(argv):
    """Inverse of nbest-to-linear: ali + words (+costs) tables →
    single-path CompactLattices (latbin/linear-to-nbest.cc)."""
    from kaldi_tpu.lattice.lattice import CompactArc, CompactLattice
    po = ParseOptions("linear-to-nbest <ali-rspec> <words-rspec> "
                      "<lmcost-rspec|''> <accost-rspec|''> <nbest-wspec>")
    args = po.read(argv)
    words_r = RandomAccessTableReader(args[1], holder="text")
    lm_r = (RandomAccessTableReader(args[2], holder="text")
            if args[2] else None)
    ac_r = (RandomAccessTableReader(args[3], holder="text")
            if args[3] else None)
    n = 0
    with TableWriter(args[4], holder="clat") as w:
        for key, ali in SequentialTableReader(args[0], holder="ivec"):
            words = [int(x) for x in words_r[key]] if key in words_r else []
            lmc = float(lm_r[key][0]) if lm_r and key in lm_r else 0.0
            acc = float(ac_r[key][0]) if ac_r and key in ac_r else 0.0
            clat = CompactLattice()
            clat.start = clat.add_state()
            cur = clat.start
            for i, wd in enumerate(words):
                nxt = clat.add_state()
                # costs ride the first arc; tids ride the last arc
                tids = (tuple(int(t) for t in ali)
                        if i == len(words) - 1 else ())
                clat.arcs[cur].append(CompactArc(
                    wd, lmc if i == 0 else 0.0, acc if i == 0 else 0.0,
                    tids, nxt))
                cur = nxt
            if not words:
                clat.finals[cur] = (lmc, acc,
                                    tuple(int(t) for t in ali))
            else:
                clat.finals[cur] = (0.0, 0.0, ())
            w[key] = clat
            n += 1
    log.info("linear-to-nbest: %d paths", n)
    return 0


# ---------------------------------------------------------------------------
# ivectorbin
# ---------------------------------------------------------------------------

@tool("ivector-extract-online")
def ivector_extract_online(argv):
    """Online i-vector extraction: one i-vector row per
    --ivector-period frames, estimate updated causally
    (ivectorbin/ivector-extract-online.cc)."""
    from kaldi_tpu.am.ivector import (OnlineIvectorEstimator,
                                      read_ivector_extractor)
    po = ParseOptions("ivector-extract-online [opts] <extractor> "
                      "<feats-rspec> <ivectors-wspec>")
    po.register("ivector-period", int, 10, "frames between estimates")
    po.register("max-count", float, 0.0, "stats count cap")
    args = po.read(argv)
    ex = read_ivector_extractor(args[0])
    period = po["ivector-period"]
    n = 0
    with TableWriter(args[2], holder="mat") as w:
        for key, feats in SequentialTableReader(args[1], holder="mat"):
            feats = np.asarray(feats)
            est = OnlineIvectorEstimator(ex, max_count=po["max-count"])
            rows = []
            for t0 in range(0, feats.shape[0], period):
                est.accept_frames(feats[t0:t0 + period])
                rows.append(est.ivector())
            w[key] = np.stack(rows) if rows else \
                np.zeros((0, ex.ivector_dim), np.float32)
            n += 1
    log.info("ivector-extract-online: %d utterances", n)
    return 0


# ---------------------------------------------------------------------------
# nnet3bin / chainbin: training
# ---------------------------------------------------------------------------

@tool("nnet3-train")
def nnet3_train(argv):
    """Cross-entropy training from feats + pdf alignments
    (nnet3bin/nnet3-train.cc role; egs inlined as feats+ali tables)."""
    from kaldi_tpu.am.nnet3_io import write_raw_model
    from kaldi_tpu.am.tdnn import TdnnConfig
    from kaldi_tpu.pipelines.nnet import XentTrainConfig, XentTrainer
    po = ParseOptions("nnet3-train [opts] <feats-rspec> <pdf-ali-rspec> "
                      "<raw-out>")
    po.register("num-pdfs", int, 0, "output dim (required)")
    po.register("hidden-dim", int, 256, "hidden layer dim")
    po.register("bottleneck-dim", int, 64, "TDNN-F bottleneck dim")
    po.register("num-layers", int, 5, "TDNN-F layers")
    po.register("num-epochs", int, 4, "training epochs")
    po.register("learning-rate", float, 1e-3, "adam lr")
    args = po.read(argv)
    if po["num-pdfs"] <= 0:
        raise KaldiError("nnet3-train: --num-pdfs is required")
    alis = RandomAccessTableReader(args[1], holder="ivec")
    feats, pdf_ali = {}, {}
    for key, f in SequentialTableReader(args[0], holder="mat"):
        if key in alis:
            feats[key] = np.asarray(f)
            pdf_ali[key] = np.asarray(alis[key], np.int32)
    if not feats:
        raise KaldiError("nnet3-train: no matched utterances")
    dim = next(iter(feats.values())).shape[1]
    cfg = TdnnConfig(feat_dim=dim, num_pdfs=po["num-pdfs"],
                     hidden_dim=po["hidden-dim"],
                     bottleneck_dim=po["bottleneck-dim"],
                     num_layers=po["num-layers"],
                     frame_subsampling_factor=1)
    tr = XentTrainer(cfg, XentTrainConfig(
        num_epochs=po["num-epochs"], learning_rate=po["learning-rate"]))
    stats = tr.train(feats, pdf_ali)
    write_raw_model(args[2], tr.params, tr.batch_stats, cfg)
    log.info("nnet3-train: %s", stats)
    return 0


def _read_phone_seqs(rspec: str) -> List[List[int]]:
    return [[int(x) for x in v]
            for _, v in SequentialTableReader(rspec, holder="ivec")]


@tool("nnet3-chain-train")
def nnet3_chain_train(argv):
    """LF-MMI training from egs archives (chainbin/nnet3-chain-train):
    den graph built from the model's tree/topo + phone sequences
    (ali-to-phones output, the chain-est-phone-lm input)."""
    from kaldi_tpu.am.chain import make_denominator_graph
    from kaldi_tpu.am.nnet3_io import infer_tdnn_config, write_raw_model
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.pipelines.chain import ChainTrainConfig, ChainTrainer
    from kaldi_tpu.pipelines.egs_io import read_egs_ark
    po = ParseOptions("nnet3-chain-train [opts] <trans-model> <raw-in> "
                      "<phone-seqs-rspec> <egs-rspec> <raw-out>")
    po.register("num-epochs", int, 2, "training epochs")
    po.register("learning-rate", float, 1e-3, "initial lr")
    po.register("lm-order", int, 3, "den phone-LM order")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    po.register("supervision-tolerance", int, 1, "numerator boundary "
                "tolerance (FSA egs); >= chunk frames = e2e free "
                "boundaries")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    den = make_denominator_graph(_read_phone_seqs(args[2]), tm.tree,
                                 tm.topo, order=po["lm-order"])
    import kaldi_tpu.am.nnet3_io as n3
    with open(args[1], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[1]}: not binary kaldi")
        model = n3.read_nnet3(f)
    cfg = infer_tdnn_config(
        model, frame_subsampling_factor=po["frame-subsampling-factor"])
    tr = ChainTrainer(cfg, den, ChainTrainConfig(
        num_epochs=po["num-epochs"], learning_rate=po["learning-rate"],
        supervision_tolerance=po["supervision-tolerance"]))
    tr.params, tr.batch_stats = n3.nnet3_to_tdnn(model, cfg)
    tr.opt_state = tr.tx.init(tr.params)
    egs = read_egs_ark(args[3])
    stats = tr.train(egs)
    write_raw_model(args[4], tr.params, tr.batch_stats, cfg)
    log.info("nnet3-chain-train: %s", stats)
    return 0


@tool("nnet3-chain-compute-prob")
def nnet3_chain_compute_prob(argv):
    """Chain objective diagnostics on held-out egs
    (chainbin/nnet3-chain-compute-prob.cc)."""
    import jax.numpy as jnp
    from kaldi_tpu.am.chain import (ChainTrainingOptions,
                                    make_denominator_graph, chain_objf)
    from kaldi_tpu.am.nnet3_io import infer_tdnn_config
    from kaldi_tpu.am.serialize import read_mdl
    from kaldi_tpu.am.tdnn import TdnnChain
    from kaldi_tpu.pipelines.egs_io import read_egs_ark
    po = ParseOptions("nnet3-chain-compute-prob [opts] <trans-model> "
                      "<raw-model> <phone-seqs-rspec> <egs-rspec>")
    po.register("lm-order", int, 3, "den phone-LM order")
    po.register("frame-subsampling-factor", int, 3, "subsampling")
    args = po.read(argv)
    tm, _ = read_mdl(args[0])
    den = make_denominator_graph(_read_phone_seqs(args[2]), tm.tree,
                                 tm.topo, order=po["lm-order"])
    import kaldi_tpu.am.nnet3_io as n3
    with open(args[1], "rb") as f:
        if f.read(2) != b"\0B":
            raise KaldiError(f"{args[1]}: not binary kaldi")
        model = n3.read_nnet3(f)
    cfg = infer_tdnn_config(
        model, frame_subsampling_factor=po["frame-subsampling-factor"])
    params, batch_stats = n3.nnet3_to_tdnn(model, cfg)
    net = TdnnChain(cfg)
    egs = read_egs_ark(args[3])
    scores = net.apply({"params": params, "batch_stats": batch_stats},
                       jnp.asarray(egs.feats), train=False)
    loss, diag = chain_objf(den, scores, jnp.asarray(egs.pdf_ali),
                            jnp.asarray(egs.mask), ChainTrainingOptions())
    log.info("nnet3-chain-compute-prob: objf %.4f (num %.4f den %.4f)",
             -float(loss), float(diag["num"]), float(diag["den"]))
    print(f"{-float(loss):.6f}")
    return 0


# ---------------------------------------------------------------------------
# rnnlmbin
# ---------------------------------------------------------------------------

@tool("rnnlm-train")
def rnnlm_train(argv):
    """Train the GRU RNNLM on integerized text (rnnlm-train role;
    --sample-k enables importance-sampled softmax)."""
    from kaldi_tpu.lm.rnnlm import RnnLmConfig, save_rnnlm, train_rnnlm
    po = ParseOptions("rnnlm-train [opts] <text-rspec> <rnnlm-out>")
    po.register("vocab-size", int, 0, "vocab size (required)")
    po.register("embed-dim", int, 64, "embedding dim")
    po.register("hidden-dim", int, 128, "GRU dim")
    po.register("num-epochs", int, 20, "epochs")
    po.register("learning-rate", float, 5e-3, "adam lr")
    po.register("sample-k", int, 0, "sampled-softmax candidates (0=full)")
    args = po.read(argv)
    if po["vocab-size"] <= 0:
        raise KaldiError("rnnlm-train: --vocab-size is required")
    sents = [[int(x) for x in v]
             for _, v in SequentialTableReader(args[0], holder="text")]
    cfg = RnnLmConfig(vocab_size=po["vocab-size"],
                      embed_dim=po["embed-dim"],
                      hidden_dim=po["hidden-dim"])
    params, _model = train_rnnlm(
        sents, cfg, num_epochs=po["num-epochs"],
        learning_rate=po["learning-rate"],
        sample_k=po["sample-k"] or None)
    save_rnnlm(args[1], params, cfg)
    log.info("rnnlm-train: trained on %d sentences", len(sents))
    return 0


@tool("rnnlm-compute-prob")
def rnnlm_compute_prob(argv):
    """Perplexity of integerized text under a trained RNNLM
    (rnnlm-compute-prob / rnnlm-sentence-probs role)."""
    from kaldi_tpu.lm.rnnlm import load_rnnlm, perplexity
    po = ParseOptions("rnnlm-compute-prob <rnnlm> <text-rspec>")
    args = po.read(argv)
    params, model = load_rnnlm(args[0])
    sents = [[int(x) for x in v]
             for _, v in SequentialTableReader(args[1], holder="text")]
    ppl = perplexity(params, model, sents)
    log.info("rnnlm-compute-prob: ppl %.3f over %d sentences",
             ppl, len(sents))
    print(f"{ppl:.6f}")
    return 0


@tool("lattice-lmrescore-kaldi-rnnlm")
def lattice_lmrescore_kaldi_rnnlm(argv):
    """Rescore lattices with the RNNLM as a deterministic on-demand LM
    (rnnlmbin/lattice-lmrescore-kaldi-rnnlm.cc)."""
    from kaldi_tpu.fst.fst import SymbolTable
    from kaldi_tpu.lattice.rescore import compose_lm
    from kaldi_tpu.lm.rnnlm import RnnLmScorer, load_rnnlm
    po = ParseOptions("lattice-lmrescore-kaldi-rnnlm [opts] <rnnlm> "
                      "<words.txt> <lattice-rspec> <lattice-wspec>")
    po.register("lm-scale", float, 1.0, "RNNLM weight (negative removes)")
    args = po.read(argv)
    params, model = load_rnnlm(args[0])
    words = SymbolTable.read(args[1])
    scorer = RnnLmScorer(params, model, words)
    n = 0
    with TableWriter(args[3], holder="clat") as w:
        for key, clat in SequentialTableReader(args[2], holder="clat"):
            w[key] = compose_lm(clat, scorer.score, words,
                                scale=po["lm-scale"])
            n += 1
    log.info("lattice-lmrescore-kaldi-rnnlm: rescored %d lattices", n)
    return 0


# ---------------------------------------------------------------------------
# sgmm2bin
# ---------------------------------------------------------------------------

@tool("sgmm2-init")
def sgmm2_init(argv):
    """Initialize an SGMM2 from global feature stats
    (sgmm2bin/sgmm2-init.cc role)."""
    from kaldi_tpu.am.sgmm2 import init_sgmm, write_sgmm2
    po = ParseOptions("sgmm2-init [opts] <feats-rspec> <sgmm2-out>")
    po.register("num-pdfs", int, 0, "number of pdfs (required)")
    po.register("num-gauss", int, 8, "shared Gaussians")
    po.register("subspace-dim", int, 4, "subspace dim")
    args = po.read(argv)
    if po["num-pdfs"] <= 0:
        raise KaldiError("sgmm2-init: --num-pdfs is required")
    tot, tot2, n = None, None, 0
    for _, feats in SequentialTableReader(args[0], holder="mat"):
        feats = np.asarray(feats, np.float64)
        if tot is None:
            tot = feats.sum(0)
            tot2 = (feats ** 2).sum(0)
        else:
            tot += feats.sum(0)
            tot2 += (feats ** 2).sum(0)
        n += feats.shape[0]
    if not n:
        raise KaldiError("sgmm2-init: no features")
    mean = tot / n
    var = np.maximum(tot2 / n - mean ** 2, 1e-3)
    model = init_sgmm(po["num-pdfs"], len(mean), po["num-gauss"],
                      po["subspace-dim"], mean, var)
    write_sgmm2(args[1], model)
    log.info("sgmm2-init: %d pdfs, %d gauss, subspace %d from %d frames",
             po["num-pdfs"], po["num-gauss"], po["subspace-dim"], n)
    return 0


@tool("sgmm2-info")
def sgmm2_info(argv):
    from kaldi_tpu.am.sgmm2 import read_sgmm2
    po = ParseOptions("sgmm2-info <sgmm2>")
    args = po.read(argv)
    m = read_sgmm2(args[0])
    print(f"num-pdfs {m.num_pdfs}")
    print(f"num-gauss {m.M.shape[0]}")
    print(f"feature-dim {m.dim}")
    print(f"subspace-dim {m.M.shape[2]}")
    return 0


@tool("sgmm2-copy")
def sgmm2_copy(argv):
    from kaldi_tpu.am.sgmm2 import read_sgmm2, write_sgmm2
    po = ParseOptions("sgmm2-copy <sgmm2-in> <sgmm2-out>")
    args = po.read(argv)
    write_sgmm2(args[1], read_sgmm2(args[0]))
    return 0


# ---------------------------------------------------------------------------
# bin: matrix/vector utilities
# ---------------------------------------------------------------------------

@tool("matrix-sum")
def matrix_sum(argv):
    """Sum matrix tables elementwise or sum one table over keys
    (bin/matrix-sum.cc)."""
    po = ParseOptions("matrix-sum <rspec1> [<rspec2> ...] <wspec-or-"
                      "wxfilename>\n  one rspec: sums over keys to a "
                      "single matrix file; several: per-key sums")
    args = po.read(argv)
    if len(args) == 2:
        acc = None
        for _, m in SequentialTableReader(args[0], holder="mat"):
            acc = np.asarray(m) if acc is None else acc + np.asarray(m)
        if acc is None:
            raise KaldiError("matrix-sum: empty table")
        from kaldi_tpu.core import io as kio
        with kio.open_wxfilename(args[1]) as f:
            kio.init_kaldi_output_stream(f)
            kio.write_matrix(f, acc)
        return 0
    readers = [RandomAccessTableReader(r, holder="mat")
               for r in args[1:-1]]
    with TableWriter(args[-1], holder="mat") as w:
        for key, m in SequentialTableReader(args[0], holder="mat"):
            acc = np.asarray(m).copy()
            for r in readers:
                acc += np.asarray(r[key])
            w[key] = acc
    return 0


@tool("vector-scale")
def vector_scale(argv):
    po = ParseOptions("vector-scale [--scale=1.0] <rspec> <wspec>")
    po.register("scale", float, 1.0, "scale factor")
    args = po.read(argv)
    with TableWriter(args[1], holder="vec") as w:
        for key, v in SequentialTableReader(args[0], holder="vec"):
            w[key] = np.asarray(v) * po["scale"]
    return 0
