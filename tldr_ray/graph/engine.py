"""BSP iteration engine over CSR shards held by a Ray actor pool.

This is the heart of the distributed layer (north rule): each iteration
is a sparse gather-scatter (SpMV) of rank mass over CSR partitions held
by an actor pool, followed by a destination-keyed exchange. Ray Data's
``groupby(dst).sum()`` shuffle is realized actor-to-actor with per-shard
PRE-COMBINING: every shard bincounts its outgoing mass per destination
vertex before anything leaves the process, so a hub destination receives
at most P partial sums per iteration regardless of its in-degree — the
skew-salting requirement is structural, not reactive (SURVEY.md §4).
Only scalars (dangling mass, L1 delta, change counts) cross the driver.

Why raw actors and not per-iteration Dataset ops: Ray Data has no
iterate-to-fixpoint primitive (SURVEY.md §7.4); re-launching a shuffle
pipeline per iteration would re-ship the static CSR every round. The
CSR is pinned once per actor (``__init__``), and each round ships only
the frontier (rank slices / label deltas) through the object store —
exactly the "actor pools for stateful stages" carve-out in the build
brief. The shard build itself (partition.build_shards) IS a Ray Data
shuffle, and results are re-exposed as a Dataset.

Message plumbing: at setup each shard publishes, per destination
partition q, the sorted vocabulary of destination vertices it ever
sends to (static for the run); receivers resolve those once to local
positions. Per iteration only dense float/int arrays aligned to those
vocabularies travel — zero-copy NumPy views over plasma buffers.

Algorithms sharing the plumbing:
- PageRank: combiner=sum; scores match the reference oracle
  (kernel.pagerank_ref, alixaxel semantics) to allclose 1e-6.
- Connected components: combiner=min over propagated labels
  (min-vertex-id fixpoint); exact.
- Label propagation: messages are (dst, label, weight) triples combined
  by (dst, label); synchronous rounds, deterministic smallest-label
  tie-break; exact.

Checkpoint/resume: every ``checkpoint_every`` iterations each shard
writes its state slice ``part=<p>.parquet`` (atomic rename) and the
driver commits ``manifest.json`` with the iteration and per-partition
lineage; ``resume=True`` loads the newest complete checkpoint and
continues — bit-identical to an uninterrupted run (state is exactly the
rank/label vector; updates are deterministic).
"""

from __future__ import annotations

import hashlib
import json
import os
import time as _time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tldr_ray.graph.partition import build_shards, vhash

# Per-object actor-to-actor shipping gate (see CsrShard._ship). Each
# plasma ref carries ~1-5 ms of fixed ownership/refcount bookkeeping
# (measured: 1024 refs/iter cost more than relaying 80 MB by value on
# one box), so only messages big enough to amortize that — or to
# threaten the driver heap / double network hops on a real cluster —
# are shipped as refs. Lower it on a multi-node cluster where the
# driver relay also means two network crossings per message.
_MSG_REF_BYTES_DEFAULT = int(os.environ.get("TLDR_RAY_MSG_REF_BYTES",
                                            8 * 1024 * 1024))

_INT64_MAX = np.iinfo(np.int64).max


def _shard_actor_cls(num_cpus: float = 0):
    """Build the shard actor class.

    ``num_cpus`` defaults to 0 so a pool of P shards is always
    schedulable regardless of the session's CPU count (P > num_cpus
    would otherwise deadlock actor creation); shard work is bursty,
    GIL-releasing NumPy, so logical oversubscription is harmless. Bench
    runs size the pool explicitly (e.g. 1.0 per shard on a 32-CPU box).
    """
    import ray

    @ray.remote(num_cpus=num_cpus)
    class CsrShard:
        def __init__(self, part: int, num_partitions: int,
                     shard_dir: str | None = None,
                     msg_ref_bytes: int | None = None):
            """Cheap construction; ``load`` does the heavy lifting so actor
            process spawn can overlap the Ray Data shard build."""
            self.part = part
            self.P = num_partitions
            self.msg_ref_bytes = msg_ref_bytes if msg_ref_bytes is not None \
                else _MSG_REF_BYTES_DEFAULT
            if shard_dir is not None:
                self.load(shard_dir)

        @staticmethod
        def _read_part(base: str):
            """Read a partition written by either shard layout: a single
            ``part=<p>.parquet`` file (sort) or a ``part=<p>/`` directory
            of scatter files. Single-threaded reads: P actors already
            saturate the node; per-actor Arrow thread pools (default =
            all cores) thrash."""
            f = f"{base}.parquet"
            if os.path.isfile(f):
                return pq.read_table(f, use_threads=False)
            files = sorted(os.listdir(base)) if os.path.isdir(base) else []
            tabs = [pq.read_table(f"{base}/{name}", use_threads=False)
                    for name in files if name.endswith(".parquet")]
            if not tabs:
                return None
            return pa.concat_tables(tabs)

        def load(self, shard_dir: str):
            part = self.part
            et = self._read_part(f"{shard_dir}/edges/part={part}")
            vt = self._read_part(f"{shard_dir}/vertices/part={part}")
            if vt is None:
                verts = np.zeros(0, dtype=np.int64)
            else:
                # scatter layout carries per-batch duplicates; dedup+sort
                verts = np.unique(np.asarray(vt["vertex"], dtype=np.int64))
            if et is None:
                src = dst = np.zeros(0, dtype=np.int64)
                w = np.zeros(0, dtype=np.float64)
            else:
                # edge order within the shard is whatever the (sorted)
                # file listing yields — the SpMV kernels are order-free
                # (bincount scatter), and determinism per shard_dir holds
                # because the listing is sorted; no O(E log E) sort here
                src = np.asarray(et["src"], dtype=np.int64)
                dst = np.asarray(et["dst"], dtype=np.int64)
                w = np.asarray(et["weight"], dtype=np.float64)
            self._build(src, dst, w, verts)

        # -- push-based streaming ingest (no disk round-trip) ----------
        def ingest(self, src, dst, w, vert_candidates,
                   digest: bytes | None = None) -> int:
            """Accumulate a scatter slice shipped directly from a build
            task (push shuffle). Arrays arrive as zero-copy NumPy views
            over plasma.

            ``digest`` is a content digest of the WHOLE source batch the
            slice came from: if Ray retries a push task after some of its
            ingest() calls already landed (worker died mid-task), the
            retried calls carry the same digest and are dropped here, so
            retries are idempotent — mirroring the scatter layout, whose
            content-digest filenames make file re-writes idempotent. Two
            *byte-identical distinct* input blocks would collide, but the
            builder digests the full pre-split batch (src+dst+w bytes),
            so that requires two entire blocks to be byte-equal.
            """
            if not hasattr(self, "_chunks"):
                self._chunks = []
                self._vchunks = []
                self._seen_digests = set()
                self._dup_drops = 0
            if digest is not None:
                if digest in self._seen_digests:
                    # duplicate delivery of the same batch slice (task
                    # retry): count it (the retried task's return value
                    # replaces the dead task's), but don't re-accumulate.
                    # Two DISTINCT byte-identical input blocks would
                    # also land here — observable, never silent: the
                    # drop is counted and reported loudly at finalize.
                    self._dup_drops += 1
                    return len(src)
                self._seen_digests.add(digest)
            self._chunks.append((np.asarray(src), np.asarray(dst),
                                 np.asarray(w)))
            self._vchunks.append(np.asarray(vert_candidates))
            return len(src)

        def finalize(self) -> int:
            chunks = getattr(self, "_chunks", [])
            vchunks = getattr(self, "_vchunks", [])
            dup_drops = getattr(self, "_dup_drops", 0)
            if dup_drops:
                # loud: a dropped duplicate-content block is either a
                # harmless task retry or (rarely) a DISTINCT
                # byte-identical input block whose edges were lost —
                # surfaced so the caller can compare n_edges vs source
                import logging

                logging.getLogger("tldr_ray").warning(
                    "shard %d dropped %d duplicate-digest ingest "
                    "deliveries (task retries are idempotent; if the "
                    "edge source can emit byte-identical distinct "
                    "blocks, verify the built n_edges against the "
                    "source count)", self.part, dup_drops)
            self._dup_drops = 0
            self._seen_digests = set()
            if chunks:
                src = np.concatenate([c[0] for c in chunks])
                dst = np.concatenate([c[1] for c in chunks])
                w = np.concatenate([c[2] for c in chunks])
            else:
                src = dst = np.zeros(0, dtype=np.int64)
                w = np.zeros(0, dtype=np.float64)
            verts = np.unique(np.concatenate(vchunks)) if vchunks \
                else np.zeros(0, dtype=np.int64)
            self._chunks = []
            self._vchunks = []
            self._build(src, dst, w, verts)
            return int(verts.size)

        def _build(self, src, dst, w, verts):
            self.verts = verts
            n_local = self.verts.size
            src_local = np.searchsorted(self.verts, src)
            outbound = np.bincount(src_local, weights=w, minlength=n_local) \
                if n_local else np.zeros(0)
            with np.errstate(divide="ignore", invalid="ignore"):
                w_norm = np.where(outbound[src_local] > 0,
                                  w / outbound[src_local], 0.0) if src.size else w
            self.dangling_mask = outbound == 0

            dst_part = (vhash(dst) % np.uint64(self.P)).astype(np.int64)
            order = np.argsort(dst_part, kind="stable")
            self.e_src_local = src_local[order]
            self.e_wnorm = np.asarray(w_norm)[order] if src.size else w_norm
            self.e_weight_sorted = w[order]     # raw weights (LPA votes)
            e_dst = dst[order]
            dp_sorted = dst_part[order]
            self.q_lo = np.searchsorted(dp_sorted, np.arange(self.P))
            self.q_hi = np.searchsorted(dp_sorted, np.arange(self.P) + 1)
            self.dvocabs = []
            self.dlocals = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                dv, dl = np.unique(e_dst[sl], return_inverse=True)
                self.dvocabs.append(dv)
                self.dlocals.append(dl)

            self.incoming_idx = None   # per sender p: local positions
            self.state = None          # float ranks or int labels
            self.n_total = None

        # -- actor-to-actor message shipping ---------------------------
        @staticmethod
        def _msg_nbytes(m) -> int:
            if isinstance(m, np.ndarray):
                return m.nbytes
            if isinstance(m, tuple):
                return sum(a.nbytes for a in m)
            return 0

        def _ship(self, msgs: list):
            """Messages are gated PER OBJECT: an array above
            ``msg_ref_bytes`` is ray.put() by this (sending) shard and
            travels plasma-to-plasma to its one receiver — the driver
            only relays the tiny ObjectRef, so no O(V) floats ever pass
            through the driver process. Small arrays stay by value:
            driver-relayed refs carry a fixed ~ms bookkeeping cost per
            object, which dominates below the gate."""
            import ray

            return [ray.put(m) if self._msg_nbytes(m) >= self.msg_ref_bytes
                    else m for m in msgs]

        @staticmethod
        def _fetch(items: list) -> list:
            import ray

            idx = [i for i, x in enumerate(items)
                   if isinstance(x, ray.ObjectRef)]
            if idx:
                got = ray.get([items[i] for i in idx])
                items = list(items)
                for i, v in zip(idx, got):
                    items[i] = v
            return items

        # -- setup -----------------------------------------------------
        def publish_vocabs(self):
            """One-time exchange goes through plasma refs so vocab bytes
            flow actor-to-actor, not through the driver (per-iteration
            mass arrays use the same path once they outgrow
            ``_MSG_REF_BYTES``)."""
            import ray
            return [ray.put(dv) for dv in self.dvocabs]

        def register_incoming(self, vocab_refs):
            import ray
            self.incoming_idx = [
                np.searchsorted(self.verts, np.asarray(ray.get(r)))
                for r in vocab_refs
            ]

        def n_local(self) -> int:
            return int(self.verts.size)

        def sample_verts(self, k: int):
            """First k local vertex ids — cheap pivot seeds for the
            sampled-betweenness CLI (no O(V) collect)."""
            return self.verts[:k].tolist()

        # -- pagerank --------------------------------------------------
        def pr_init(self, n_total: int):
            self.n_total = n_total
            self.state = np.full(self.verts.size, 1.0 / n_total) \
                if n_total else np.zeros(0)

        def pr_set_total(self, n_total: int):
            """Resume path: restore n_total without resetting state."""
            self.n_total = n_total

        def pr_warm_start(self, warm, fill: float) -> float:
            """Seed the rank state from a prior run's (sorted ids,
            scores): local vertices found in the carry-over keep their
            old score, new vertices start at ``fill`` (the uniform
            mass). Returns the local state sum so the driver can
            renormalize globally (the old graph's mass on vanished
            vertices must be redistributed)."""
            ids_sorted, scores = warm
            st = np.full(self.verts.size, fill)
            if ids_sorted.size:
                pos = np.searchsorted(ids_sorted, self.verts)
                pos = np.minimum(pos, ids_sorted.size - 1)
                hit = ids_sorted[pos] == self.verts
                st[hit] = scores[pos[hit]]
            self.state = st
            return float(st.sum())

        def pr_scale_state(self, factor: float):
            self.state = self.state * factor

        def pr_set_personalization(self, seed):
            """Personalized restart vector: (sorted seed ids, weights),
            passed as an ObjectRef that Ray resolves to zero-copy plasma
            views; each shard keeps only its local slice. None resets to
            the uniform vector."""
            if seed is None:
                self.pvec = None
                return 0.0
            seed_ids, seed_w = seed
            p = np.zeros(self.verts.size)
            pos = np.searchsorted(seed_ids, self.verts)
            pos = np.minimum(pos, seed_ids.size - 1)
            hit = seed_ids[pos] == self.verts
            p[hit] = seed_w[pos[hit]]
            self.pvec = p
            local = float(p.sum())
            # start from the restart vector itself
            self.state = p.copy()
            return local

        def pr_rescale_personalization(self, factor: float):
            self.pvec = self.pvec * factor
            self.state = self.state * factor

        def pr_messages(self):
            """Per-destination-partition pre-combined mass arrays. Small
            message sets travel by value; large ones are ray.put() here
            so the bytes move plasma-to-plasma between shard actors and
            the driver only relays ObjectRefs — O(P^2) refs per
            iteration instead of O(P * V) floats through one process."""
            m = self.state[self.e_src_local] * self.e_wnorm
            masses = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                masses.append(np.bincount(self.dlocals[q], weights=m[sl],
                                          minlength=self.dvocabs[q].size))
            dangling = float(self.state[self.dangling_mask].sum())
            return dangling, self._ship(masses)

        def pr_apply(self, masses, dangling_total: float, alpha: float) -> float:
            masses = self._fetch(masses)
            coef = (1.0 - alpha) + alpha * dangling_total
            if getattr(self, "pvec", None) is not None:
                new = coef * self.pvec      # personalized restart
            else:
                new = np.full(self.verts.size, coef / self.n_total)
            for idx, arr in zip(self.incoming_idx, masses):
                arr = np.asarray(arr)
                if arr.size:
                    np.add.at(new, idx, alpha * arr)
            delta = float(np.abs(new - self.state).sum())
            self.state = new
            return delta

        def pr_step(self, masses, dangling_total: float, alpha: float):
            """Fused apply + emit: one RPC round per iteration instead of
            two (halves the BSP coordination cost that dominates small
            graphs). Returns (delta, dangling_next, masses_next)."""
            delta = self.pr_apply(masses, dangling_total, alpha)
            dangling, next_masses = self.pr_messages()
            return delta, dangling, next_masses

        # -- connected components (min-label) --------------------------
        def label_init(self):
            self.state = self.verts.copy()

        def label_warm(self, warm):
            """Seed labels from a prior run's (sorted ids, labels):
            state = min(own id, carried label). Correct ONLY for
            edge-ADDITION deltas (see GraphEngine.connected_components
            docstring for the argument); unknown vertices fall back to
            their own id."""
            ids_sorted, labels = warm
            st = self.verts.copy()
            if ids_sorted.size:
                pos = np.searchsorted(ids_sorted, self.verts)
                pos = np.minimum(pos, ids_sorted.size - 1)
                hit = ids_sorted[pos] == self.verts
                st[hit] = np.minimum(st[hit], labels[pos[hit]])
            self.state = st

        def cc_messages(self):
            lab = self.state[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.full(self.dvocabs[q].size, _INT64_MAX, dtype=np.int64)
                if self.dlocals[q].size:
                    np.minimum.at(acc, self.dlocals[q], lab[sl])
                out.append(acc)
            return self._ship(out)

        def cc_apply(self, mins) -> int:
            mins = self._fetch(mins)
            new = self.state.copy()
            for idx, arr in zip(self.incoming_idx, mins):
                arr = np.asarray(arr)
                if arr.size:
                    np.minimum.at(new, idx, arr)
            changed = int((new != self.state).sum())
            self.state = new
            return changed

        # -- BFS hop distance (min-plus over the same min machinery) ---
        def bfs_init(self, seeds) -> int:
            """State = 0 at local seed vertices, INT64_MAX elsewhere;
            returns how many seeds this shard owns (the driver checks
            the global sum is nonzero before iterating)."""
            seeds = np.asarray(seeds, dtype=np.int64)
            self.state = np.where(np.isin(self.verts, seeds),
                                  0, _INT64_MAX).astype(np.int64)
            return int((self.state == 0).sum())

        def bfs_messages(self):
            """Per-destination-shard min(dist[src] + 1) — identical
            shipping layout to cc_messages, so bfs_apply IS cc_apply
            (element-wise min merge). Unreached sources propagate
            INT64_MAX unchanged (no +1 overflow)."""
            d = self.state[self.e_src_local]
            nxt = np.where(d == _INT64_MAX, _INT64_MAX, d + 1)
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.full(self.dvocabs[q].size, _INT64_MAX,
                              dtype=np.int64)
                if self.dlocals[q].size:
                    np.minimum.at(acc, self.dlocals[q], nxt[sl])
                out.append(acc)
            return self._ship(out)

        # -- sampled Brandes betweenness (forward sigma BFS + level-
        #    synchronous backward dependency accumulation). Sigma stays
        #    EXACT: path counts are integer-valued float64 sums (exact
        #    to 2^53); only delta is genuinely float, and its per-shard
        #    np.add.at order + fixed sender loop make the fixpoint
        #    deterministic for a given layout. --------------------------
        def bc_begin(self):
            self.bc_acc = np.zeros(self.verts.size)

        def bc_fwd_init(self, seeds) -> int:
            seeds = np.asarray(seeds, dtype=np.int64)
            self.bc_dist = np.where(np.isin(self.verts, seeds),
                                    0, _INT64_MAX).astype(np.int64)
            self.bc_sigma = (self.bc_dist == 0).astype(np.float64)
            return int((self.bc_dist == 0).sum())

        def bc_fwd_messages(self, level: int):
            d = self.bc_dist[self.e_src_local]
            sig = np.where(d == level,
                           self.bc_sigma[self.e_src_local], 0.0)
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.zeros(self.dvocabs[q].size)
                if self.dlocals[q].size:
                    np.add.at(acc, self.dlocals[q], sig[sl])
                out.append(acc)
            return self._ship(out)

        def bc_fwd_apply(self, sums, level: int) -> int:
            sums = self._fetch(sums)
            inc = np.zeros(self.verts.size)
            for idx, arr in zip(self.incoming_idx, sums):
                arr = np.asarray(arr)
                if arr.size:
                    np.add.at(inc, idx, arr)
            newly = (self.bc_dist == _INT64_MAX) & (inc > 0.0)
            self.bc_dist[newly] = level + 1
            self.bc_sigma[newly] = inc[newly]
            return int(newly.sum())

        def bc_max_level(self) -> int:
            m = self.bc_dist[self.bc_dist != _INT64_MAX]
            return int(m.max()) if m.size else 0

        def bc_bwd_init(self):
            self.bc_delta = np.zeros(self.verts.size)

        def bc_bwd_messages(self, level: int):
            """Level-k vertices send (1 + delta)/sigma over every
            out-edge; a receiver at level k-1 is NECESSARILY a
            predecessor on some shortest path (BFS level property), so
            multiplying the received sum by its own sigma is exactly
            Brandes' dependency accumulation."""
            d = self.bc_dist[self.e_src_local]
            sig = np.where(self.bc_sigma[self.e_src_local] > 0.0,
                           self.bc_sigma[self.e_src_local], 1.0)
            contrib = np.where(
                d == level,
                (1.0 + self.bc_delta[self.e_src_local]) / sig, 0.0)
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.zeros(self.dvocabs[q].size)
                if self.dlocals[q].size:
                    np.add.at(acc, self.dlocals[q], contrib[sl])
                out.append(acc)
            return self._ship(out)

        def bc_bwd_apply(self, sums, level: int):
            sums = self._fetch(sums)
            inc = np.zeros(self.verts.size)
            for idx, arr in zip(self.incoming_idx, sums):
                arr = np.asarray(arr)
                if arr.size:
                    np.add.at(inc, idx, arr)
            mask = self.bc_dist == (level - 1)
            self.bc_delta[mask] += self.bc_sigma[mask] * inc[mask]

        def bc_accumulate(self, seed) -> None:
            acc = self.bc_delta.copy()
            acc[np.isin(self.verts,
                        np.asarray(seed, dtype=np.int64))] = 0.0
            self.bc_acc += acc

        def bc_finish(self):
            self.state = self.bc_acc

        # -- weighted SSSP (Bellman-Ford min-plus, float64 state) ------
        def sssp_init(self, seeds) -> int:
            seeds = np.asarray(seeds, dtype=np.int64)
            self.state = np.where(np.isin(self.verts, seeds),
                                  0.0, np.inf)
            return int((self.state == 0.0).sum())

        def sssp_messages(self):
            """min(dist[src] + w) per destination — distances
            accumulate seed-outward, so every path sum is associated
            left-to-right and the float fixpoint is deterministic
            (message order can't change which IEEE sum wins the min)."""
            d = self.state[self.e_src_local] + self.e_weight_sorted
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.full(self.dvocabs[q].size, np.inf)
                if self.dlocals[q].size:
                    np.minimum.at(acc, self.dlocals[q], d[sl])
                out.append(acc)
            return self._ship(out)

        # -- temporal earliest-arrival reachability --------------------
        def temporal_messages(self):
            """Time-respecting relaxation: edge weights ARE departure
            timestamps; an edge (u,v) at time tau is usable only once
            u has been reached by tau (arr[u] <= tau), and then
            delivers arrival tau at v. Candidates are picked from the
            fixed timestamp set (never combined), so the fixpoint is
            bit-deterministic; min-merge reuses cc_apply."""
            src_arr = self.state[self.e_src_local]
            d = np.where(self.e_weight_sorted >= src_arr,
                         self.e_weight_sorted, np.inf)
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.full(self.dvocabs[q].size, np.inf)
                if self.dlocals[q].size:
                    np.minimum.at(acc, self.dlocals[q], d[sl])
                out.append(acc)
            return self._ship(out)

        # -- widest path (max-min bottleneck semiring) -----------------
        def widest_init(self, seeds) -> int:
            """State = +inf at seeds (no constraint yet), -inf
            elsewhere (unreached). Returns seeds owned locally."""
            seeds = np.asarray(seeds, dtype=np.int64)
            self.state = np.where(np.isin(self.verts, seeds),
                                  np.inf, -np.inf)
            return int(np.isposinf(self.state).sum())

        def widest_messages(self):
            """max over edges of min(width[src], w) per destination —
            the max-min dual of sssp_messages. Widths are picked (never
            arithmetically combined) from the fixed edge-weight set, so
            the float fixpoint is trivially bit-deterministic. Unreached
            sources propagate -inf, harmless under the max merge."""
            d = np.minimum(self.state[self.e_src_local],
                           self.e_weight_sorted)
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.full(self.dvocabs[q].size, -np.inf)
                if self.dlocals[q].size:
                    np.maximum.at(acc, self.dlocals[q], d[sl])
                out.append(acc)
            return self._ship(out)

        def max_apply(self, maxes) -> int:
            """Element-wise MAX merge — the mirror of cc_apply."""
            maxes = self._fetch(maxes)
            new = self.state.copy()
            for idx, arr in zip(self.incoming_idx, maxes):
                arr = np.asarray(arr)
                if arr.size:
                    np.maximum.at(new, idx, arr)
            changed = int((new != self.state).sum())
            self.state = new
            return changed

        # -- label propagation (weighted mode, smallest-label ties) ----
        def lpa_messages(self):
            lab = self.state[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                dl = self.dlocals[q]
                lq = lab[sl]
                wq = self.e_weight_sorted[sl]
                if dl.size:
                    order = np.lexsort((lq, dl))
                    dl_s, lq_s, wq_s = dl[order], lq[order], wq[order]
                    bound = np.empty(dl_s.size, dtype=bool)
                    bound[0] = True
                    bound[1:] = (dl_s[1:] != dl_s[:-1]) | (lq_s[1:] != lq_s[:-1])
                    starts = np.nonzero(bound)[0]
                    sums = np.add.reduceat(wq_s, starts)
                    trip = (dl_s[starts], lq_s[starts], sums)
                else:
                    trip = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0, np.float64))
                out.append(trip)
            return self._ship(out)

        def lpa_apply(self, trips) -> int:
            trips = self._fetch(trips)
            pos_all, lab_all, w_all = [], [], []
            for idx, (dl, lq, wq) in zip(self.incoming_idx, trips):
                if len(dl):
                    pos_all.append(idx[dl])
                    lab_all.append(np.asarray(lq))
                    w_all.append(np.asarray(wq))
            if not pos_all:
                return 0
            pos = np.concatenate(pos_all)
            lab = np.concatenate(lab_all)
            w = np.concatenate(w_all)
            # combine across senders by (pos, label)
            order = np.lexsort((lab, pos))
            pos, lab, w = pos[order], lab[order], w[order]
            bound = np.empty(pos.size, dtype=bool)
            bound[0] = True
            bound[1:] = (pos[1:] != pos[:-1]) | (lab[1:] != lab[:-1])
            starts = np.nonzero(bound)[0]
            pos_u, lab_u = pos[starts], lab[starts]
            w_u = np.add.reduceat(w, starts)
            # per pos: max weight, tie -> smallest label. Sort by
            # (pos, -w, label) and take the first row per pos.
            order2 = np.lexsort((lab_u, -w_u, pos_u))
            pos_s, lab_s = pos_u[order2], lab_u[order2]
            first = np.empty(pos_s.size, dtype=bool)
            first[0] = True
            first[1:] = pos_s[1:] != pos_s[:-1]
            tgt, val = pos_s[first], lab_s[first]
            new = self.state.copy()
            new[tgt] = val
            changed = int((new != self.state).sum())
            self.state = new
            return changed

        def lpa_init(self):
            # LPA votes are weighed by RAW edge weight (e_weight_sorted)
            self.state = self.verts.copy()

        # -- seeded (semi-supervised) label spreading -------------------
        def lpa_seed_init(self, seeds) -> int:
            """Seed-clamped variant: ``seeds`` = (sorted ids, labels).
            Non-seeds start unlabeled (-1); seeds are clamped for the
            whole run. Returns how many seeds this shard owns."""
            ids_sorted, labels = seeds
            st = np.full(self.verts.size, -1, dtype=np.int64)
            if ids_sorted.size:
                pos = np.searchsorted(ids_sorted, self.verts)
                pos = np.minimum(pos, ids_sorted.size - 1)
                hit = ids_sorted[pos] == self.verts
                st[hit] = labels[pos[hit]]
            self._clamp = st >= 0
            self.state = st
            return int(self._clamp.sum())

        def lpa_seed_messages(self):
            """lpa_messages restricted to LABELED sources — unlabeled
            vertices don't vote yet."""
            lab = self.state[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                dl = self.dlocals[q]
                lq = lab[sl]
                wq = self.e_weight_sorted[sl]
                m = lq >= 0
                dl, lq, wq = dl[m], lq[m], wq[m]
                if dl.size:
                    order = np.lexsort((lq, dl))
                    dl_s, lq_s, wq_s = dl[order], lq[order], wq[order]
                    bound = np.empty(dl_s.size, dtype=bool)
                    bound[0] = True
                    bound[1:] = (dl_s[1:] != dl_s[:-1]) \
                        | (lq_s[1:] != lq_s[:-1])
                    starts = np.nonzero(bound)[0]
                    sums = np.add.reduceat(wq_s, starts)
                    trip = (dl_s[starts], lq_s[starts], sums)
                else:
                    trip = (np.zeros(0, np.int64),
                            np.zeros(0, np.int64),
                            np.zeros(0, np.float64))
                out.append(trip)
            return self._ship(out)

        def lpa_seed_apply(self, trips) -> int:
            """lpa_apply with the seed clamp: seeds never change; every
            voted non-seed adopts argmax (max weight, ties -> smallest
            label); unvoted vertices keep their state."""
            trips = self._fetch(trips)
            pos_all, lab_all, w_all = [], [], []
            for idx, (dl, lq, wq) in zip(self.incoming_idx, trips):
                if len(dl):
                    pos_all.append(idx[dl])
                    lab_all.append(np.asarray(lq))
                    w_all.append(np.asarray(wq))
            if not pos_all:
                return 0
            pos = np.concatenate(pos_all)
            lab = np.concatenate(lab_all)
            w = np.concatenate(w_all)
            order = np.lexsort((lab, pos))
            pos, lab, w = pos[order], lab[order], w[order]
            bound = np.empty(pos.size, dtype=bool)
            bound[0] = True
            bound[1:] = (pos[1:] != pos[:-1]) | (lab[1:] != lab[:-1])
            starts = np.nonzero(bound)[0]
            pos_u, lab_u = pos[starts], lab[starts]
            w_u = np.add.reduceat(w, starts)
            order2 = np.lexsort((lab_u, -w_u, pos_u))
            pos_s, lab_s = pos_u[order2], lab_u[order2]
            first = np.empty(pos_s.size, dtype=bool)
            first[0] = True
            first[1:] = pos_s[1:] != pos_s[:-1]
            tgt, val = pos_s[first], lab_s[first]
            free = ~self._clamp[tgt]
            new = self.state.copy()
            new[tgt[free]] = val[free]
            changed = int((new != self.state).sum())
            self.state = new
            return changed

        # -- maximal matching (hashed-priority handshake rounds) -------
        def match_init(self):
            self.state = np.full(self.verts.size, -1, dtype=np.int64)

        def match_unmatched_messages(self, r: int):
            """Per destination partition: for each destination vertex,
            the unmatched source neighbor with the SMALLEST round-
            salted priority splitmix64(src * K + r) (ties -> smaller
            id). The per-round re-salt is what makes the handshake
            converge in O(log n) expected rounds (Israeli-Itai) —
            min-by-raw-id serializes on paths/rings. Triples
            (dst_local, src, key) pre-combine per shard, so a hub
            receives at most P candidates."""
            from tldr_ray.stages.dedup import _mix64

            K = np.uint64(0x9E3779B97F4A7C15)
            src_v = self.verts[self.e_src_local]
            un = self.state[self.e_src_local] == -1
            kv = _mix64(src_v.astype(np.uint64) * K + np.uint64(r))
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                m = un[sl]
                dl = self.dlocals[q][m]
                sv = src_v[sl][m]
                kq = kv[sl][m]
                if dl.size:
                    order = np.lexsort((sv, kq, dl))
                    dl, sv, kq = dl[order], sv[order], kq[order]
                    first = np.empty(dl.size, dtype=bool)
                    first[0] = True
                    first[1:] = dl[1:] != dl[:-1]
                    trip = (dl[first], sv[first],
                            kq[first].view(np.int64))
                else:
                    trip = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0, np.int64))
                out.append(trip)
            return self._ship(out)

        def match_set_proposals(self, trips):
            """p(v) = the min-(key, id) unmatched neighbor across all
            senders, for unmatched local v."""
            trips = self._fetch(trips)
            pos_all, sv_all, kq_all = [], [], []
            for idx, (dl, sv, kq) in zip(self.incoming_idx, trips):
                if len(dl):
                    pos_all.append(idx[np.asarray(dl)])
                    sv_all.append(np.asarray(sv))
                    kq_all.append(np.asarray(kq).view(np.uint64))
            p = np.full(self.verts.size, _INT64_MAX, dtype=np.int64)
            if pos_all:
                pos = np.concatenate(pos_all)
                sv = np.concatenate(sv_all)
                kq = np.concatenate(kq_all)
                order = np.lexsort((sv, kq, pos))
                pos, sv = pos[order], sv[order]
                first = np.empty(pos.size, dtype=bool)
                first[0] = True
                first[1:] = pos[1:] != pos[:-1]
                p[pos[first]] = sv[first]
            p[self.state != -1] = _INT64_MAX
            self._prop = p

        def match_propose_messages(self):
            """Ship (partner, proposer) pairs to the partner's owning
            partition."""
            has = self._prop != _INT64_MAX
            partner = self._prop[has]
            proposer = self.verts[has]
            part = (vhash(partner) % np.uint64(self.P)).astype(np.int64)
            out = []
            for q in range(self.P):
                m = part == q
                out.append((partner[m], proposer[m]))
            return self._ship(out)

        def match_resolve(self, pairs) -> int:
            """Match u=partner with v=proposer iff the proposals are
            mutual (p(u) == v); returns new matches on this shard."""
            pairs = self._fetch(pairs)
            new = 0
            for (partner, proposer) in pairs:
                partner = np.asarray(partner)
                proposer = np.asarray(proposer)
                if not partner.size:
                    continue
                pos = np.searchsorted(self.verts, partner)
                pos = np.minimum(pos, max(self.verts.size - 1, 0))
                ok = self.verts[pos] == partner
                pos, v = pos[ok], proposer[ok]
                mutual = self._prop[pos] == v
                tgt, val = pos[mutual], v[mutual]
                self.state[tgt] = val
                new += int(tgt.size)
            return new

        # -- maximal independent set (Luby, hashed priorities) ---------
        def mis_init(self):
            self.state = np.full(self.verts.size, -1, dtype=np.int64)

        def mis_decide(self, trips, r: int) -> int:
            """An ACTIVE vertex joins the MIS iff its own round-salted
            (priority, id) beats the minimum over its ACTIVE neighbors
            (delivered pre-combined by match_unmatched_messages, which
            already filters state == -1 sources and uses the same
            splitmix64(v*K + r) priorities). No active neighbor ->
            joins. Returns new members on this shard."""
            from tldr_ray.stages.dedup import _mix64

            K = np.uint64(0x9E3779B97F4A7C15)
            trips = self._fetch(trips)
            pos_all, sv_all, kq_all = [], [], []
            for idx, (dl, sv, kq) in zip(self.incoming_idx, trips):
                if len(dl):
                    pos_all.append(idx[np.asarray(dl)])
                    sv_all.append(np.asarray(sv))
                    kq_all.append(np.asarray(kq).view(np.uint64))
            best_k = np.full(self.verts.size, np.uint64(0xFFFFFFFFFFFFFFFF),
                             dtype=np.uint64)
            best_v = np.full(self.verts.size, _INT64_MAX, dtype=np.int64)
            if pos_all:
                pos = np.concatenate(pos_all)
                sv = np.concatenate(sv_all)
                kq = np.concatenate(kq_all)
                order = np.lexsort((sv, kq, pos))
                pos, sv, kq = pos[order], sv[order], kq[order]
                first = np.empty(pos.size, dtype=bool)
                first[0] = True
                first[1:] = pos[1:] != pos[:-1]
                best_k[pos[first]] = kq[first]
                best_v[pos[first]] = sv[first]
            active = self.state == -1
            own_k = _mix64(self.verts.astype(np.uint64) * K
                           + np.uint64(r))
            win = active & ((own_k < best_k)
                            | ((own_k == best_k)
                               & (self.verts < best_v)))
            self._new_mis = win
            self.state[win] = 1
            return int(win.sum())

        def mis_notify_messages(self):
            """Per destination partition: a boolean per destination
            vertex — does it have a NEW MIS source neighbor? (OR is
            the combiner.)"""
            flag = self._new_mis[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                acc = np.zeros(self.dvocabs[q].size, dtype=bool)
                dl = self.dlocals[q][flag[sl]]
                if dl.size:
                    acc[np.unique(dl)] = True
                out.append(acc)
            return self._ship(out)

        def mis_exclude(self, flags) -> int:
            """Active vertices with a new MIS neighbor leave the game
            (state 0). Returns the shard's remaining active count."""
            flags = self._fetch(flags)
            hit = np.zeros(self.verts.size, dtype=bool)
            for idx, arr in zip(self.incoming_idx, flags):
                arr = np.asarray(arr)
                if arr.size:
                    hit[idx[np.flatnonzero(arr)]] = True
            out = (self.state == -1) & hit
            self.state[out] = 0
            return int((self.state == -1).sum())

        # -- Jones-Plassmann greedy coloring ----------------------------
        def color_init(self):
            from tldr_ray.stages.dedup import _mix64

            K = np.uint64(0x9E3779B97F4A7C15)
            self.state = np.full(self.verts.size, -1, dtype=np.int64)
            self._prio = _mix64(self.verts.astype(np.uint64) * K)

        def color_nbr_max_messages(self):
            """Per destination: the MAXIMUM (static priority, id) over
            UNCOLORED source neighbors (pre-combined per shard)."""
            un = self.state[self.e_src_local] == -1
            src_v = self.verts[self.e_src_local]
            kv = self._prio[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                m = un[sl]
                dl = self.dlocals[q][m]
                sv = src_v[sl][m]
                kq = kv[sl][m]
                if dl.size:
                    # descending (priority, id): invert for lexsort
                    order = np.lexsort((-sv, np.invert(kq), dl))
                    dl, sv, kq = dl[order], sv[order], kq[order]
                    first = np.empty(dl.size, dtype=bool)
                    first[0] = True
                    first[1:] = dl[1:] != dl[:-1]
                    trip = (dl[first], sv[first],
                            kq[first].view(np.int64))
                else:
                    trip = (np.zeros(0, np.int64),
                            np.zeros(0, np.int64),
                            np.zeros(0, np.int64))
                out.append(trip)
            return self._ship(out)

        def color_decide(self, trips) -> int:
            """An uncolored vertex WINS the round iff its own
            (priority, id) exceeds every uncolored neighbor's — winners
            form an independent set, so same-round color picks cannot
            conflict. Returns the shard's winner count."""
            trips = self._fetch(trips)
            best_k = np.zeros(self.verts.size, dtype=np.uint64)
            best_v = np.full(self.verts.size, -1, dtype=np.int64)
            has = np.zeros(self.verts.size, dtype=bool)
            for idx, (dl, sv, kq) in zip(self.incoming_idx, trips):
                if not len(dl):
                    continue
                pos = idx[np.asarray(dl)]
                sv = np.asarray(sv)
                kq = np.asarray(kq).view(np.uint64)
                better = (~has[pos]) | (kq > best_k[pos]) \
                    | ((kq == best_k[pos]) & (sv > best_v[pos]))
                upd = pos[better]
                best_k[upd] = kq[better]
                best_v[upd] = sv[better]
                has[upd] = True
            un = self.state == -1
            win = un & (~has | (self._prio > best_k)
                        | ((self._prio == best_k)
                           & (self.verts > best_v)))
            self._winner = win
            return int(win.sum())

        def color_mask_messages(self):
            """Per destination: OR of (1 << color) over COLORED source
            neighbors (int64 bitmask; JP needs <= maxdeg+1 < 63
            colors — guarded in color_assign)."""
            col = self.state[self.e_src_local]
            m = col >= 0
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                mm = m[sl]
                dl = self.dlocals[q][mm]
                bits = (np.int64(1) << col[sl][mm]).astype(np.int64)
                acc = np.zeros(self.dvocabs[q].size, dtype=np.int64)
                if dl.size:
                    np.bitwise_or.at(acc, dl, bits)
                out.append(acc)
            return self._ship(out)

        def color_assign(self, masks) -> int:
            """Winners take the lowest color bit absent from their
            colored-neighbor mask."""
            masks = self._fetch(masks)
            acc = np.zeros(self.verts.size, dtype=np.int64)
            for idx, arr in zip(self.incoming_idx, masks):
                arr = np.asarray(arr)
                if arr.size:
                    np.bitwise_or.at(acc, idx, arr)
            w = np.flatnonzero(self._winner)
            if not w.size:
                # no winners here this round — but the shard may still
                # hold uncolored vertices waiting on remote neighbors
                return int((self.state == -1).sum())
            inv = ~acc[w].view(np.uint64)
            low = inv & (~inv + np.uint64(1))      # lowest unset bit
            c = np.round(np.log2(low.astype(np.float64))).astype(np.int64)
            if (c >= 62).any():
                raise ValueError("coloring exceeded the 62-color "
                                 "bitmask budget")
            self.state[w] = c
            return int((self.state == -1).sum())

        # -- eigenvector centrality (shifted power iteration) ----------
        def eig_init(self):
            self.state = np.ones(self.verts.size)
            self._eig_prev = self.state.copy()

        def eig_apply(self, masses) -> float:
            """Consume incoming raw-weight masses and form (A + I) x
            from the previous NORMALIZED vector (the +I shift makes the
            iteration converge on bipartite components too). Returns
            the local sum of squares so the driver can assemble the
            global L2 norm."""
            masses = self._fetch(masses)
            new = self.state.copy()          # the +I shift term
            for idx, arr in zip(self.incoming_idx, masses):
                arr = np.asarray(arr)
                if arr.size:
                    np.add.at(new, idx, arr)
            self._eig_prev = self.state
            self.state = new
            return float((self.state * self.state).sum())

        def eig_scale_emit(self, factor: float):
            """Normalize by the global L2 factor, then emit next-round
            messages FROM the normalized vector (fused so one RPC round
            covers normalize + emit). Returns (l1_delta_vs_prev,
            masses)."""
            self.state = self.state * factor
            d = float(np.abs(self.state - self._eig_prev).sum())
            m = self.state[self.e_src_local] * self.e_weight_sorted
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                out.append(np.bincount(self.dlocals[q], weights=m[sl],
                                       minlength=self.dvocabs[q].size))
            return d, self._ship(out)

        # -- HITS primitives (shared with eigenvector centrality) ------
        def emit_state_messages(self):
            """Emit raw-weight SpMV messages from the CURRENT state —
            no normalization, no delta (the mutual-recursion loops own
            that sequencing). The emitted vector is stashed (by
            reference — every update REBINDS state, never mutates) so
            ``set_state_with_delta`` can measure change across a full
            mutual-recursion round even though intermediate applies
            overwrite ``state``."""
            self._stash = self.state
            m = self.state[self.e_src_local] * self.e_weight_sorted
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                out.append(np.bincount(self.dlocals[q], weights=m[sl],
                                       minlength=self.dvocabs[q].size))
            return self._ship(out)

        def hits_apply(self, masses) -> float:
            """state = incoming masses only (NO +I shift — A^T A is
            PSD so the alternating iteration cannot oscillate).
            Returns the local sum of squares."""
            masses = self._fetch(masses)
            new = np.zeros(self.verts.size)
            for idx, arr in zip(self.incoming_idx, masses):
                arr = np.asarray(arr)
                if arr.size:
                    np.add.at(new, idx, arr)
            self.state = new
            return float((new * new).sum())

        def scale_and_state_ref(self, factor: float):
            """Normalize by the global factor and hand the state out as
            one plasma ref (the cross-pool handoff: the twin engine's
            same-index shard owns the SAME sorted vertex set, so the
            array aligns positionally)."""
            import ray

            self.state = self.state * factor
            return ray.put(self.state)

        def set_state_with_delta(self, arr) -> float:
            """Overwrite state with the handed-off array (auto-deref'd
            zero-copy from plasma); returns the L1 change vs the vector
            this shard last EMITTED (the stash) — the convergence
            signal across one full mutual-recursion round."""
            arr = np.asarray(arr, dtype=np.float64)
            ref = getattr(self, "_stash", None)
            if ref is None:
                ref = self.state
            d = float(np.abs(arr - ref).sum()) \
                if ref is not None and ref.shape == arr.shape \
                else float("inf")
            self.state = arr.copy()
            return d

        # -- k-core decomposition (distributed H-index iteration) ------
        def kcore_init(self) -> int:
            """state = undirected degree (assumes symmetrized, deduped
            weight-1 edges — each neighbor counted once)."""
            self.state = np.bincount(
                self.e_src_local, minlength=self.verts.size) \
                .astype(np.int64)
            return int(self.state.max()) if self.state.size else 0

        def kcore_messages(self):
            """Per-destination (dst_local, value, count) triples — the
            pre-combined histogram a receiver needs to compute the
            H-index of its neighbors' current values."""
            val = self.state[self.e_src_local]
            out = []
            for q in range(self.P):
                sl = slice(self.q_lo[q], self.q_hi[q])
                dl = self.dlocals[q]
                vq = val[sl]
                if dl.size:
                    order = np.lexsort((vq, dl))
                    dl_s, vq_s = dl[order], vq[order]
                    bound = np.empty(dl_s.size, dtype=bool)
                    bound[0] = True
                    bound[1:] = (dl_s[1:] != dl_s[:-1]) | (vq_s[1:] != vq_s[:-1])
                    starts = np.nonzero(bound)[0]
                    cnt = np.diff(np.concatenate([starts, [dl_s.size]]))
                    trip = (dl_s[starts], vq_s[starts], cnt.astype(np.int64))
                else:
                    trip = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                            np.zeros(0, np.int64))
                out.append(trip)
            return self._ship(out)

        def kcore_apply(self, trips) -> int:
            """new(v) = min(state(v), H-index of neighbor values):
            converges exactly to the core number (Lu et al., the
            H-index fixpoint of networks)."""
            trips = self._fetch(trips)
            pos_all, val_all, cnt_all = [], [], []
            for idx, (dl, vv, cc) in zip(self.incoming_idx, trips):
                if len(dl):
                    pos_all.append(idx[np.asarray(dl)])
                    val_all.append(np.asarray(vv))
                    cnt_all.append(np.asarray(cc))
            if not pos_all:
                return 0
            pos = np.concatenate(pos_all)
            val = np.concatenate(val_all)
            cnt = np.concatenate(cnt_all)
            # per vertex: sort values desc, running neighbor count,
            # H = max over rows of min(value, cum_count)
            order = np.lexsort((-val, pos))
            pos, val, cnt = pos[order], val[order], cnt[order]
            cum = np.cumsum(cnt)
            new_seg = np.concatenate([[True], pos[1:] != pos[:-1]])
            starts = np.flatnonzero(new_seg)
            seg_of = np.cumsum(new_seg) - 1
            base = (cum[starts] - cnt[starts])[seg_of]
            cand = np.minimum(val, cum - base)
            h = np.maximum.reduceat(cand, starts)
            new = self.state.copy()
            tgt = pos[starts]
            new[tgt] = np.minimum(new[tgt], h)
            changed = int((new != self.state).sum())
            self.state = new
            return changed

        # -- state I/O -------------------------------------------------
        def collect(self):
            return self.verts, self.state

        def collect_table(self, value_name: str = "score") -> pa.Table:
            """Per-shard result as an Arrow table; the driver consumes
            only the ObjectRef (ray.data.from_arrow_refs), so no O(V)
            vertex state is ever concatenated in the driver process."""
            return pa.table({"vertex": pa.array(self.verts),
                             value_name: pa.array(self.state)})

        def write_state(self, ckpt_dir: str, dtype: str):
            os.makedirs(ckpt_dir, exist_ok=True)
            col = pa.array(self.state.astype(np.float64 if dtype == "f8"
                                             else np.int64))
            t = pa.table({"vertex": pa.array(self.verts), "value": col})
            tmp = f"{ckpt_dir}/part={self.part}.parquet.tmp-{uuid.uuid4().hex[:6]}"
            pq.write_table(t, tmp)
            os.replace(tmp, f"{ckpt_dir}/part={self.part}.parquet")
            return int(self.verts.size)

        def load_state(self, ckpt_dir: str, dtype: str):
            t = pq.read_table(f"{ckpt_dir}/part={self.part}.parquet",
                              use_threads=False)
            v = np.asarray(t["vertex"], dtype=np.int64)
            assert np.array_equal(v, self.verts), "checkpoint/partition mismatch"
            self.state = np.asarray(
                t["value"], dtype=np.float64 if dtype == "f8" else np.int64)

    return CsrShard


class GraphEngine:
    """Actor pool over the shard layout of ``build_shards``."""

    def __init__(self, shard_dir: str, num_partitions: int | None = None,
                 cpus_per_shard: float = 0, _prestarted=None,
                 msg_ref_bytes: int | None = None):
        import ray

        with open(f"{shard_dir}/manifest.json") as f:
            self.manifest = json.load(f)
        self.P = num_partitions or self.manifest["num_partitions"]
        self.shard_dir = shard_dir
        if _prestarted is not None:
            self.shards = _prestarted
            ray.get([s.load.remote(shard_dir) for s in self.shards])
        else:
            cls = _shard_actor_cls(cpus_per_shard)
            self.shards = [cls.remote(p, self.P, shard_dir,
                                      msg_ref_bytes=msg_ref_bytes)
                           for p in range(self.P)]
        self._exchange_vocabs()

    @classmethod
    def from_edges_streaming(cls, edges, num_partitions: int = 8,
                             symmetrize: bool = False,
                             msg_ref_bytes: int | None = None):
        """Push-based shuffle straight into the actor pool: the Ray Data
        build tasks scatter each batch by destination partition and ship
        the slices to the shard actors as they stream through — no
        parquet write + reload round-trip, no all-to-all sort. The
        ``ray.get`` on the pushes inside each task is the backpressure.
        Use ``build_shards`` + ``GraphEngine(shard_dir)`` instead when a
        re-loadable on-disk graph layout is wanted (resume across driver
        restarts); iterative-state checkpointing works identically in
        both modes."""
        import ray

        P = num_partitions
        actor_cls = _shard_actor_cls(0)
        shards = [actor_cls.remote(p, P, msg_ref_bytes=msg_ref_bytes)
                  for p in range(P)]

        def push(batch: pa.Table) -> pa.Table:
            src = np.asarray(batch["src"], dtype=np.int64)
            dst = np.asarray(batch["dst"], dtype=np.int64)
            w = np.asarray(batch["weight"], dtype=np.float64)
            # Content digest of the whole pre-split batch: shards use it
            # to drop duplicate deliveries when Ray retries this task
            # after a partial-success worker failure (see ingest()).
            h = hashlib.blake2b(digest_size=16)
            h.update(src.tobytes())
            h.update(dst.tobytes())
            h.update(w.tobytes())
            batch_digest = h.digest()
            if symmetrize:
                src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
                w = np.concatenate([w, w])
            part = (vhash(src) % np.uint64(P)).astype(np.int64)
            order = np.argsort(part, kind="stable")
            src, dst, w, part = src[order], dst[order], w[order], part[order]
            lo = np.searchsorted(part, np.arange(P))
            hi = np.searchsorted(part, np.arange(P) + 1)
            v = np.unique(np.concatenate([src, dst]))
            vpart = (vhash(v) % np.uint64(P)).astype(np.int64)
            vorder = np.argsort(vpart, kind="stable")
            v, vpart = v[vorder], vpart[vorder]
            vlo = np.searchsorted(vpart, np.arange(P))
            vhi = np.searchsorted(vpart, np.arange(P) + 1)
            futures = []
            for p in range(P):
                if hi[p] == lo[p] and vhi[p] == vlo[p]:
                    continue
                sl = slice(lo[p], hi[p])
                futures.append(shards[p].ingest.remote(
                    src[sl], dst[sl], w[sl], v[vlo[p]:vhi[p]],
                    digest=batch_digest))
            n = np.int64(sum(ray.get(futures))) if futures else np.int64(0)
            return pa.table({"n": pa.array([n], pa.int64())})

        counts = edges.map_batches(push, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
        n_edges = int(counts["n"].sum()) if len(counts) else 0
        ray.get([s.finalize.remote() for s in shards])

        eng = cls.__new__(cls)
        eng.P = P
        eng.shard_dir = None
        eng.manifest = {"num_partitions": P, "layout": "streaming",
                        "symmetrized": symmetrize, "n_edges": n_edges}
        eng.shards = shards
        eng._exchange_vocabs()
        return eng

    def _exchange_vocabs(self):
        import ray

        vocabs = ray.get([s.publish_vocabs.remote() for s in self.shards])
        ray.get([
            self.shards[q].register_incoming.remote(
                [vocabs[p][q] for p in range(self.P)])
            for q in range(self.P)
        ])
        self.n_total = sum(ray.get([s.n_local.remote() for s in self.shards]))

    @classmethod
    def from_edges(cls, edges, num_partitions: int = 8,
                   work_dir: str | None = None, symmetrize: bool = False,
                   cpus_per_shard: float = 0,
                   msg_ref_bytes: int | None = None):
        """Build shards and the actor pool; actor processes are spawned
        BEFORE the Ray Data shard build so interpreter startup overlaps
        the shuffle. Prestarted actors are ALWAYS num_cpus=0 regardless
        of ``cpus_per_shard`` — they hold no work until after the build,
        and reserving P x cpus_per_shard logical CPUs during the Ray
        Data shuffle would starve the build tasks and deadlock the
        streaming executor (the actors-leave-CPUs invariant).
        ``cpus_per_shard`` is kept for signature compatibility; pass it
        to ``GraphEngine(shard_dir, cpus_per_shard=...)`` when actors
        are created AFTER a build instead."""
        import ray  # noqa: F401

        work_dir = work_dir or f"/tmp/tldr_ray/graph-{uuid.uuid4().hex[:8]}"
        actor_cls = _shard_actor_cls(0)
        prestarted = [actor_cls.remote(p, num_partitions,
                                       msg_ref_bytes=msg_ref_bytes)
                      for p in range(num_partitions)]
        build_shards(edges, num_partitions, work_dir, symmetrize=symmetrize)
        return cls(work_dir, num_partitions, _prestarted=prestarted)

    # -- algorithms ----------------------------------------------------
    def pagerank(self, damping: float = 0.85, tolerance: float = 1e-4,
                 max_iterations: int = 200, checkpoint_every: int = 0,
                 checkpoint_dir: str | None = None, resume: bool = False,
                 personalization=None, warm_start=None,
                 collect: bool = True):
        """Returns (vertex_ids, scores, info). alixaxel/pagerank semantics
        (see kernel.pagerank_ref).

        ``personalization``: optional (ids, weights) arrays — the restart
        distribution of personalized PageRank (weights renormalized over
        the seeds actually present in the graph). The restart vector is
        broadcast once via plasma; each shard keeps its local slice.
        Checkpoints record a digest of the restart vector, so a
        personalized run may resume — the caller must pass the SAME
        personalization (digest-checked; a mismatch refuses loudly).

        ``warm_start``: optional (ids, scores) from a PREVIOUS run on a
        possibly different edge set — the streaming-link-graph pattern:
        re-ingest the grown graph, seed each surviving vertex with its
        old score (new vertices get the uniform mass), renormalize to a
        distribution, and iterate; near the old fixpoint this converges
        in a fraction of the cold iterations. The final fixpoint is the
        SAME as a cold run (power iteration is init-independent) — only
        the iteration count changes. Mutually exclusive with resuming
        from a checkpoint (a found checkpoint is a full state restore).
        """
        import ray

        from tldr_ray.state import read_manifest

        pers_sorted = None
        pers_digest = None
        if personalization is not None:
            ids0 = np.asarray(personalization[0], dtype=np.int64)
            w0 = np.asarray(personalization[1], dtype=np.float64)
            if ids0.size == 0:
                raise ValueError("personalization needs at least one seed")
            order = np.argsort(ids0)
            pers_sorted = (ids0[order], w0[order])
            pers_digest = hashlib.blake2b(
                pers_sorted[0].tobytes() + pers_sorted[1].tobytes(),
                digest_size=8).hexdigest()
        self._pers_digest = pers_digest

        def _apply_personalization():
            seed_ref = ray.put(pers_sorted)
            ray.get([s.pr_set_total.remote(self.n_total)
                     for s in self.shards])
            covered = sum(ray.get(
                [s.pr_set_personalization.remote(seed_ref)
                 for s in self.shards]))
            if covered <= 0:
                raise ValueError("no personalization seed is present in "
                                 "the graph")
            ray.get([s.pr_rescale_personalization.remote(1.0 / covered)
                     for s in self.shards])

        start_iter = 0
        ck = read_manifest(checkpoint_dir) if (resume and checkpoint_dir) \
            else None
        if ck is not None and warm_start is not None:
            raise ValueError(
                "warm_start and a found resume checkpoint are mutually "
                "exclusive — the checkpoint is a full state restore")
        if ck is not None:
            if ck["num_partitions"] != self.P or ck["n_total"] != self.n_total:
                raise ValueError(
                    "checkpoint lineage mismatch: manifest "
                    f"(P={ck['num_partitions']}, n={ck['n_total']}) vs engine "
                    f"(P={self.P}, n={self.n_total}) — refusing to resume")
            if ck.get("personalization_digest") != pers_digest:
                raise ValueError(
                    "checkpoint restart-vector mismatch: manifest digest "
                    f"{ck.get('personalization_digest')} vs requested "
                    f"{pers_digest} — resume a personalized run with the "
                    "same personalization it was started with")
            start_iter = ck["iteration"]
            if pers_sorted is not None:
                _apply_personalization()   # rebuild each shard's pvec
            else:
                ray.get([s.pr_set_personalization.remote(None)
                         for s in self.shards])   # clear prior restart vec
            # the checkpointed rank state overwrites the init above
            ray.get([s.load_state.remote(f"{checkpoint_dir}/iter={start_iter}",
                                         "f8") for s in self.shards])
            ray.get([s.pr_set_total.remote(self.n_total) for s in self.shards])
        elif warm_start is not None:
            if pers_sorted is not None:
                _apply_personalization()
            else:
                ray.get([s.pr_set_personalization.remote(None)
                         for s in self.shards])
            ray.get([s.pr_set_total.remote(self.n_total)
                     for s in self.shards])
            ids_w = np.asarray(warm_start[0], dtype=np.int64)
            sc_w = np.asarray(warm_start[1], dtype=np.float64)
            order = np.argsort(ids_w)
            wref = ray.put((ids_w[order], sc_w[order]))
            fill = 1.0 / self.n_total if self.n_total else 0.0
            sums = ray.get([s.pr_warm_start.remote(wref, fill)
                            for s in self.shards])
            total = sum(sums)
            if total > 0:
                ray.get([s.pr_scale_state.remote(1.0 / total)
                         for s in self.shards])
        elif pers_sorted is not None:
            _apply_personalization()
        else:
            ray.get([s.pr_set_personalization.remote(None)
                     for s in self.shards])
            ray.get([s.pr_init.remote(self.n_total) for s in self.shards])

        if self.n_total == 0:
            return (np.empty(0, np.int64), np.empty(0, np.float64),
                    {"iterations": 0, "converged": True})

        delta = np.inf
        it = start_iter
        iter_secs: list[float] = []
        # bootstrap round: every shard emits its first message set
        outs = ray.get([s.pr_messages.remote() for s in self.shards])
        dangling_total = sum(o[0] for o in outs)
        masses = [o[1] for o in outs]
        while delta > tolerance and it < max_iterations:
            _t = _time.time()
            step = ray.get([
                self.shards[q].pr_step.remote(
                    [masses[p][q] for p in range(self.P)],
                    dangling_total, damping)
                for q in range(self.P)
            ])
            delta = float(sum(s_[0] for s_ in step))
            dangling_total = sum(s_[1] for s_ in step)
            masses = [s_[2] for s_ in step]
            it += 1
            iter_secs.append(round(_time.time() - _t, 4))
            if checkpoint_every and checkpoint_dir and it % checkpoint_every == 0:
                self._checkpoint(checkpoint_dir, it, "f8")

        # collect=False leaves the result sharded (consume with
        # to_dataset / write_parquet — no O(V) arrays on the driver)
        ids, scores = self._collect(np.float64) if collect else (None, None)
        return ids, scores, {
            "iterations": it,
            "converged": delta <= tolerance,
            "iter_secs": iter_secs,
            "sec_per_iteration": round(float(np.mean(iter_secs)), 4)
            if iter_secs else 0.0,
        }

    def connected_components(self, max_iterations: int = 200,
                             warm_start=None, collect: bool = True):
        """Min-vertex-id label fixpoint. Supply symmetrized edges for
        undirected semantics. Returns (vertex_ids, component_ids, info).

        ``warm_start``: optional (ids, labels) from a prior run over a
        graph this one GREW from (edge additions only — never
        removals). Valid because min-label updates are monotone
        decreasing and every carried label is the id of a vertex still
        connected to its carrier: the fixpoint from this init equals
        the cold fixpoint, reached in fewer rounds (old intra-component
        propagation is pre-done; only merge fronts move). Edge
        REMOVALS break the invariant (a carried label may name a
        vertex no longer reachable) — rerun cold after removals."""
        import ray

        if warm_start is not None:
            ids_w = np.asarray(warm_start[0], dtype=np.int64)
            lb_w = np.asarray(warm_start[1], dtype=np.int64)
            order = np.argsort(ids_w)
            wref = ray.put((ids_w[order], lb_w[order]))
            ray.get([s.label_warm.remote(wref) for s in self.shards])
        else:
            ray.get([s.label_init.remote() for s in self.shards])
        it, changed = 0, 1
        while changed and it < max_iterations:
            outs = ray.get([s.cc_messages.remote() for s in self.shards])
            counts = ray.get([
                self.shards[q].cc_apply.remote([outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, labels = self._collect(np.int64) if collect else (None, None)
        return ids, labels, {"iterations": it, "converged": changed == 0}

    def bfs(self, seeds, max_rounds: int = 10_000, collect: bool = True):
        """Unweighted hop distance from ``seeds`` (min-plus frontier
        fixpoint over the CC message plumbing; unreached vertices keep
        INT64_MAX — callers map those to their own sentinel). Supply
        symmetrized edges for undirected distance. Returns
        (vertex_ids, distances, info)."""
        import ray

        n_seed = sum(ray.get([
            s.bfs_init.remote([int(x) for x in seeds])
            for s in self.shards]))
        if n_seed == 0:
            raise ValueError("bfs: no seed vertex present in the graph")
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.bfs_messages.remote() for s in self.shards])
            counts = ray.get([
                self.shards[q].cc_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, dist = self._collect(np.int64) if collect else (None, None)
        return ids, dist, {"rounds": it, "converged": changed == 0,
                           "seeds_found": n_seed}

    def betweenness_sampled(self, seeds, max_rounds: int = 10_000,
                            collect: bool = True):
        """Sampled Brandes betweenness: for each pivot seed, one
        forward sigma-BFS (level-synchronous path counting) and one
        backward dependency sweep over the SAME resident shards; the
        per-vertex result is the summed dependency score delta_s(v)
        over the pivots (the classic unbiased estimator scales it by
        n/k — callers needing absolute betweenness apply that). Every
        round is two pre-combined exchanges; per-pivot cost is
        O(2 * eccentricity) rounds. Returns (ids, scores, info)."""
        import ray

        ray.get([s.bc_begin.remote() for s in self.shards])
        total_rounds = 0
        for s0 in seeds:
            n_seed = sum(ray.get([
                s.bc_fwd_init.remote([int(s0)]) for s in self.shards]))
            if n_seed == 0:
                raise ValueError(
                    f"betweenness: pivot {s0} not in the graph")
            level, changed = 0, 1
            while changed and level < max_rounds:
                outs = ray.get([s.bc_fwd_messages.remote(level)
                                for s in self.shards])
                counts = ray.get([
                    self.shards[q].bc_fwd_apply.remote(
                        [outs[p][q] for p in range(self.P)], level)
                    for q in range(self.P)])
                changed = sum(counts)
                level += 1
                total_rounds += 1
            maxlev = max(ray.get([s.bc_max_level.remote()
                                  for s in self.shards]))
            ray.get([s.bc_bwd_init.remote() for s in self.shards])
            for lev in range(maxlev, 0, -1):
                outs = ray.get([s.bc_bwd_messages.remote(lev)
                                for s in self.shards])
                ray.get([
                    self.shards[q].bc_bwd_apply.remote(
                        [outs[p][q] for p in range(self.P)], lev)
                    for q in range(self.P)])
                total_rounds += 1
            ray.get([s.bc_accumulate.remote([int(s0)])
                     for s in self.shards])
        ray.get([s.bc_finish.remote() for s in self.shards])
        ids, bc = self._collect(np.float64) if collect else (None, None)
        return ids, bc, {"rounds": total_rounds,
                         "pivots": len(list(seeds))}

    def sssp(self, seeds, max_rounds: int = 10_000, collect: bool = True):
        """Weighted single-source shortest path (Bellman-Ford min-plus
        fixpoint; converges in <= V-1 rounds for non-negative weights —
        negative edges are the caller's risk and the rounds cap the
        backstop). Unreached vertices keep +inf. Returns
        (vertex_ids, distances float64, info)."""
        import ray

        n_seed = sum(ray.get([
            s.sssp_init.remote([int(x) for x in seeds])
            for s in self.shards]))
        if n_seed == 0:
            raise ValueError("sssp: no seed vertex present in the graph")
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.sssp_messages.remote() for s in self.shards])
            counts = ray.get([
                self.shards[q].cc_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, dist = self._collect(np.float64) if collect else (None, None)
        return ids, dist, {"rounds": it, "converged": changed == 0,
                           "seeds_found": n_seed}

    def temporal_reachability(self, seeds, max_rounds: int = 10_000,
                              start_time: float = 0.0,
                              collect: bool = True):
        """Earliest-arrival time-respecting reachability: edge
        weights are departure timestamps, an edge is traversable only
        after its source has been reached (arr[u] <= tau), and each
        traversal arrives at its own tau — so arrival times along any
        valid path are non-decreasing. Seeds start at ``start_time``;
        unreached vertices keep +inf. Synchronous min-relaxation
        rounds (temporal_messages + the cc_apply min merge); a finite
        ``max_rounds`` gives the exact <=max_rounds-hop bounded form,
        mirrored by the unrolled SQL oracle."""
        import ray

        n_seed = sum(ray.get([
            s.sssp_init.remote([int(x) for x in seeds])
            for s in self.shards]))
        if n_seed == 0:
            raise ValueError(
                "temporal_reachability: no seed vertex in the graph")
        if start_time != 0.0:
            raise NotImplementedError(
                "non-zero start_time: shift timestamps instead")
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.temporal_messages.remote()
                            for s in self.shards])
            counts = ray.get([
                self.shards[q].cc_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, arr = self._collect(np.float64) if collect else (None, None)
        return ids, arr, {"rounds": it, "converged": changed == 0,
                          "seeds_found": n_seed}

    def widest_path(self, seeds, max_rounds: int = 10_000,
                    collect: bool = True):
        """Widest-path (maximum-bottleneck) width from ``seeds`` over
        the DIRECTED weighted edge set: the max-min semiring fixpoint
        width(v) = max over edges (u,v) of min(width(u), w(u,v)).
        Capped at ``max_rounds`` synchronous rounds, so with a finite
        cap the result is the exact <=max_rounds-hop bounded widest
        path — bit-deterministic, which is what the unrolled SQL
        oracle mirrors. Seeds carry +inf, unreached stay -inf."""
        import ray

        n_seed = sum(ray.get([
            s.widest_init.remote([int(x) for x in seeds])
            for s in self.shards]))
        if n_seed == 0:
            raise ValueError("widest_path: no seed vertex in the graph")
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.widest_messages.remote()
                            for s in self.shards])
            counts = ray.get([
                self.shards[q].max_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, width = self._collect(np.float64) if collect else (None, None)
        return ids, width, {"rounds": it, "converged": changed == 0,
                            "seeds_found": n_seed}

    def label_propagation(self, max_rounds: int = 20, collect: bool = True):
        """Synchronous weighted LPA, smallest-label tie-break.
        Returns (vertex_ids, labels, info)."""
        import ray

        ray.get([s.lpa_init.remote() for s in self.shards])
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.lpa_messages.remote() for s in self.shards])
            counts = ray.get([
                self.shards[q].lpa_apply.remote([outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, labels = self._collect(np.int64) if collect else (None, None)
        return ids, labels, {"rounds": it, "stable": changed == 0}

    def label_spread(self, seeds, max_rounds: int = 10,
                     collect: bool = True):
        """Semi-supervised label spreading: clamped seed labels,
        synchronous weighted-majority rounds where only LABELED
        vertices vote (smallest-label ties), unlabeled vertices stay
        -1 until a labeled neighbor reaches them. Runs EXACTLY
        ``max_rounds`` rounds unless a true fixpoint lands earlier —
        the trajectory is deterministic, so a fixed-round SQL
        unrolling is bit-equivalent. ``seeds`` = (sorted ids, labels
        int64)."""
        import ray

        ids = np.asarray(seeds[0], dtype=np.int64)
        labs = np.asarray(seeds[1], dtype=np.int64)
        sref = ray.put((ids, labs))
        n_seed = sum(ray.get([s.lpa_seed_init.remote(sref)
                              for s in self.shards]))
        if n_seed == 0:
            raise ValueError("label_spread: no seed vertex in graph")
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.lpa_seed_messages.remote()
                            for s in self.shards])
            counts = ray.get([
                self.shards[q].lpa_seed_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids_out, labels = self._collect(np.int64) if collect \
            else (None, None)
        return ids_out, labels, {"rounds": it, "stable": changed == 0,
                                 "seeds_found": n_seed}

    def kcore(self, max_rounds: int = 1000):
        """Core numbers via the distributed H-index fixpoint: start at
        the undirected degree, repeatedly replace each vertex's value by
        the H-index of its neighbors' values — converges exactly to the
        k-core decomposition. Supply SYMMETRIZED, DEDUPED, weight-1
        edges. Returns (vertex_ids, core_numbers, info)."""
        import ray

        ray.get([s.kcore_init.remote() for s in self.shards])
        it, changed = 0, 1
        while changed and it < max_rounds:
            outs = ray.get([s.kcore_messages.remote() for s in self.shards])
            counts = ray.get([
                self.shards[q].kcore_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            changed = sum(counts)
            it += 1
        ids, cores = self._collect(np.int64)
        return ids, cores, {"rounds": it, "stable": changed == 0}

    def maximal_matching(self, max_rounds: int = 200,
                         collect: bool = True):
        """Deterministic maximal matching by synchronous handshake
        rounds: every unmatched vertex proposes to the unmatched
        neighbor with the smallest round-salted hash priority
        splitmix64(nbr * K + round); mutual proposals match. Each
        round is two pre-combined exchanges. The globally min-priority
        vertex with an unmatched neighbor always matches, so a
        no-progress round proves maximality; the per-round re-salt
        gives O(log n) expected rounds, and the whole trajectory is
        deterministic and SQL-mirrorable round for round. Returns
        (vertex_ids, partner int64 with -1 = unmatched, info)."""
        import ray

        ray.get([s.match_init.remote() for s in self.shards])
        it, new = 0, 1
        while new and it < max_rounds:
            outs = ray.get([s.match_unmatched_messages.remote(it + 1)
                            for s in self.shards])
            ray.get([
                self.shards[q].match_set_proposals.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)])
            props = ray.get([s.match_propose_messages.remote()
                             for s in self.shards])
            counts = ray.get([
                self.shards[q].match_resolve.remote(
                    [props[p][q] for p in range(self.P)])
                for q in range(self.P)])
            new = sum(counts)
            it += 1
        ids, partner = self._collect(np.int64) if collect \
            else (None, None)
        return ids, partner, {"rounds": it, "stable": new == 0}

    def maximal_independent_set(self, max_rounds: int = 200,
                                collect: bool = True):
        """Luby's maximal independent set with deterministic hashed
        priorities: each round, every undecided vertex whose
        round-salted (splitmix64 priority, id) beats all undecided
        neighbors joins the set; its neighbors drop out. Two
        pre-combined exchanges per round, O(log n) expected rounds,
        fully deterministic -> SQL-mirrorable. Returns (vertex_ids,
        membership 1/0, info)."""
        import ray

        ray.get([s.mis_init.remote() for s in self.shards])
        it, remaining = 0, 1
        while remaining and it < max_rounds:
            outs = ray.get([s.match_unmatched_messages.remote(it + 1)
                            for s in self.shards])
            ray.get([
                self.shards[q].mis_decide.remote(
                    [outs[p][q] for p in range(self.P)], it + 1)
                for q in range(self.P)])
            notes = ray.get([s.mis_notify_messages.remote()
                             for s in self.shards])
            counts = ray.get([
                self.shards[q].mis_exclude.remote(
                    [notes[p][q] for p in range(self.P)])
                for q in range(self.P)])
            remaining = sum(counts)
            it += 1
        ids, member = self._collect(np.int64) if collect \
            else (None, None)
        return ids, member, {"rounds": it, "done": remaining == 0}

    def greedy_coloring(self, max_rounds: int = 500,
                        collect: bool = True):
        """Jones-Plassmann distributed greedy coloring: static hashed
        priorities; each round every uncolored local-maximum vertex
        colors itself with the lowest color unused by its colored
        neighbors (the round's winners are independent, so picks never
        conflict). Two pre-combined exchanges per round; O(log n)
        expected rounds; deterministic -> SQL-mirrorable. Returns
        (vertex_ids, colors int64 >= 0, info)."""
        import ray

        ray.get([s.color_init.remote() for s in self.shards])
        it, remaining = 0, 1
        while remaining and it < max_rounds:
            outs = ray.get([s.color_nbr_max_messages.remote()
                            for s in self.shards])
            ray.get([
                self.shards[q].color_decide.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)])
            masks = ray.get([s.color_mask_messages.remote()
                             for s in self.shards])
            counts = ray.get([
                self.shards[q].color_assign.remote(
                    [masks[p][q] for p in range(self.P)])
                for q in range(self.P)])
            remaining = sum(counts)
            it += 1
        ids, colors = self._collect(np.int64) if collect \
            else (None, None)
        return ids, colors, {"rounds": it, "done": remaining == 0}

    def eigenvector_centrality(self, tolerance: float = 1e-10,
                               max_iterations: int = 500,
                               collect: bool = True):
        """Principal-eigenvector centrality by distributed power
        iteration on (A + I) — the HITS hub==authority case once edges
        are symmetrized (supply symmetrize=True at build). Per round:
        one raw-weight SpMV exchange (same pre-combined per-partition
        masses and plasma-ref gating as PageRank) + one fused
        normalize-and-emit RPC; the driver only relays the scalar L2
        factor. Scores are L2-normalized, all non-negative."""
        import math

        import ray

        ray.get([s.eig_init.remote() for s in self.shards])
        res = ray.get([s.eig_scale_emit.remote(
            1.0 / math.sqrt(max(self.n_total, 1)))
            for s in self.shards])
        outs = [r[1] for r in res]
        it, converged = 0, False
        while it < max_iterations:
            ss = ray.get([
                self.shards[q].eig_apply.remote(
                    [outs[p][q] for p in range(self.P)])
                for q in range(self.P)
            ])
            norm = math.sqrt(sum(ss))
            if norm == 0.0:                    # edgeless graph
                break
            res = ray.get([s.eig_scale_emit.remote(1.0 / norm)
                           for s in self.shards])
            delta = sum(r[0] for r in res)
            outs = [r[1] for r in res]
            it += 1
            if delta < tolerance * max(self.n_total, 1):
                converged = True
                break
        ids, scores = self._collect(np.float64) if collect \
            else (None, None)
        return ids, scores, {"rounds": it, "converged": converged}

    # -- plumbing ------------------------------------------------------
    def _checkpoint(self, checkpoint_dir: str, iteration: int, dtype: str):
        import ray

        from tldr_ray.state import write_manifest

        d = f"{checkpoint_dir}/iter={iteration}"
        counts = ray.get([s.write_state.remote(d, dtype) for s in self.shards])
        write_manifest(checkpoint_dir, {
            "iteration": iteration,
            "n_total": self.n_total,
            "num_partitions": self.P,
            "rows_per_part": counts,
            "shard_dir": self.shard_dir,
            "n_edges": self.manifest.get("n_edges"),
            # restart-vector lineage: None for uniform PageRank, the
            # seed digest for personalized runs (resume digest-checks it)
            "personalization_digest": getattr(self, "_pers_digest", None),
        })

    def _collect(self, dtype):
        import ray

        parts = ray.get([s.collect.remote() for s in self.shards])
        ids = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
        vals = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, dtype)
        order = np.argsort(ids)
        return ids[order], vals[order]

    def to_dataset(self, value_name: str = "score"):
        """Current state as a Ray Dataset (vertex, <value_name>) built
        from per-shard Arrow-table ObjectRefs — the driver never holds
        the concatenated vertex state (unlike ``_collect``, which exists
        for small-result oracle parity)."""
        import ray.data as rd

        refs = [s.collect_table.remote(value_name) for s in self.shards]
        return rd.from_arrow_refs(refs)

    def shutdown(self):
        import ray

        for s in self.shards:
            ray.kill(s)
        self.shards = []


# -- convenience one-shots ---------------------------------------------

def pagerank(edges, num_partitions: int = 8, damping: float = 0.85,
             tolerance: float = 1e-4, max_iterations: int = 200,
             work_dir: str | None = None, **ckpt):
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir)
    try:
        return eng.pagerank(damping, tolerance, max_iterations, **ckpt)
    finally:
        eng.shutdown()


def connected_components(edges, num_partitions: int = 8,
                         max_iterations: int = 200,
                         work_dir: str | None = None):
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.connected_components(max_iterations)
    finally:
        eng.shutdown()


def sssp_distances(edges, seeds, num_partitions: int = 8,
                   max_rounds: int = 10_000, symmetrize: bool = False,
                   work_dir: str | None = None):
    """Weighted shortest-path distance from ``seeds`` over the DIRECTED
    edge set (pass symmetrize=True for undirected). Returns
    (vertex_ids, distances, info); unreached vertices carry +inf."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=symmetrize)
    try:
        return eng.sssp(seeds, max_rounds)
    finally:
        eng.shutdown()


def temporal_reach_times(edges, seeds, num_partitions: int = 8,
                         max_rounds: int = 10_000,
                         work_dir: str | None = None):
    """Earliest time-respecting arrival from ``seeds`` over DIRECTED
    edges whose weight column carries the departure timestamp.
    Returns (vertex_ids, arrival float64, info); unreached +inf."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir)
    try:
        return eng.temporal_reachability(seeds, max_rounds)
    finally:
        eng.shutdown()


def widest_path_widths(edges, seeds, num_partitions: int = 8,
                       max_rounds: int = 10_000, symmetrize: bool = False,
                       work_dir: str | None = None):
    """Maximum-bottleneck (widest-path) width from ``seeds`` over the
    DIRECTED weighted edge set (symmetrize=True for undirected). A
    finite ``max_rounds`` yields the exact <=max_rounds-hop bounded
    widest path. Returns (vertex_ids, widths float64, info); seeds
    carry +inf, unreached -inf."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=symmetrize)
    try:
        return eng.widest_path(seeds, max_rounds)
    finally:
        eng.shutdown()


def bfs_hops(edges, seeds, num_partitions: int = 8,
             max_rounds: int = 10_000, work_dir: str | None = None):
    """Undirected hop distance from ``seeds`` (edges are symmetrized
    like connected_components). Returns (vertex_ids, distances, info);
    unreached vertices carry INT64_MAX."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.bfs(seeds, max_rounds)
    finally:
        eng.shutdown()


def betweenness_sampled(edges, seeds, num_partitions: int = 8,
                        max_rounds: int = 10_000,
                        work_dir: str | None = None):
    """Sampled Brandes betweenness over the undirected simple graph
    underlying ``edges`` (symmetrized like connected_components).
    Returns (vertex_ids, dependency scores, info)."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.betweenness_sampled(seeds, max_rounds)
    finally:
        eng.shutdown()


def label_propagation(edges, num_partitions: int = 8, max_rounds: int = 20,
                      work_dir: str | None = None):
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.label_propagation(max_rounds)
    finally:
        eng.shutdown()


def k_core(edges, num_partitions: int = 8, max_rounds: int = 1000,
           work_dir: str | None = None):
    """Core numbers of the undirected simple graph underlying ``edges``:
    self-loops dropped, duplicate/reversed edges collapsed (per-batch
    pre-combiner + one global pair dedup), then the engine's H-index
    fixpoint."""
    def undirect(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["src"], dtype=np.int64)
        d = np.asarray(batch["dst"], dtype=np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        lo, hi = np.minimum(s, d), np.maximum(s, d)
        u = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0]), "b": pa.array(u[:, 1])})

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"], dtype=np.int64)
        b = np.asarray(batch["b"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "weight": pa.array(np.ones(2 * a.size)),
            }
        )

    simple = (
        edges.map_batches(undirect, batch_format="pyarrow")
        .groupby(["a", "b"]).count().select_columns(["a", "b"])
        .map_batches(both_dirs, batch_format="pyarrow")
    )
    eng = GraphEngine.from_edges(simple, num_partitions, work_dir)
    try:
        return eng.kcore(max_rounds)
    finally:
        eng.shutdown()


def eigenvector_centrality(edges, num_partitions: int = 8,
                           max_iterations: int = 500,
                           tolerance: float = 1e-10,
                           work_dir: str | None = None):
    """Eigenvector centrality of the symmetrized weighted graph via
    distributed shifted power iteration. Returns
    (vertex_ids, scores, info); scores are the L2-normalized principal
    eigenvector of (A + I) — same ranking as A's for connected
    non-negative graphs, convergent on bipartite ones."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.eigenvector_centrality(tolerance, max_iterations)
    finally:
        eng.shutdown()


def hits(edges, num_partitions: int = 8, max_iterations: int = 200,
         tolerance: float = 1e-10, work_dir: str | None = None):
    """HITS hubs & authorities over the DIRECTED edge set by
    distributed alternating power iteration (Kleinberg 1999):
    a = normalize(A^T h), h = normalize(A a) — the principal right /
    left singular vectors of the weighted adjacency.

    Plan: TWO shard pools over the same vhash(vertex) % P partitioning
    — one on the edges as-is (its SpMV lands h-mass on in-edges:
    computes a), one on the reversed edges (computes h). Because the
    partition function and the endpoint sets coincide, same-index
    shards own IDENTICAL sorted vertex arrays, so the per-iteration
    state handoff is P plasma refs moving actor-to-actor — the driver
    relays refs and scalars only. No +I shift needed: A^T A is PSD,
    the alternation cannot oscillate.

    Returns (vertex_ids, hubs, authorities, info); both vectors
    L2-normalized, non-negative."""
    import math

    import ray

    def rev(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch["dst"], "dst": batch["src"],
                         "weight": batch["weight"]})

    eng_f = GraphEngine.from_edges(edges, num_partitions, work_dir)
    eng_r = GraphEngine.from_edges(
        edges.map_batches(rev, batch_format="pyarrow"), num_partitions)
    try:
        n = max(eng_f.n_total, 1)
        ray.get([s.eig_init.remote() for s in eng_f.shards])
        ray.get([s.pr_scale_state.remote(1.0 / math.sqrt(n))
                 for s in eng_f.shards])
        it, converged = 0, False
        while it < max_iterations:
            outs = ray.get([s.emit_state_messages.remote()
                            for s in eng_f.shards])
            ss = ray.get([
                eng_f.shards[q].hits_apply.remote(
                    [outs[p][q] for p in range(eng_f.P)])
                for q in range(eng_f.P)])
            na = math.sqrt(sum(ss))
            if na == 0.0:
                break
            arefs = ray.get([s.scale_and_state_ref.remote(1.0 / na)
                             for s in eng_f.shards])
            ray.get([r.set_state_with_delta.remote(aref)
                     for r, aref in zip(eng_r.shards, arefs)])
            outs = ray.get([s.emit_state_messages.remote()
                            for s in eng_r.shards])
            ss = ray.get([
                eng_r.shards[q].hits_apply.remote(
                    [outs[p][q] for p in range(eng_r.P)])
                for q in range(eng_r.P)])
            nh = math.sqrt(sum(ss))
            if nh == 0.0:
                break
            hrefs = ray.get([s.scale_and_state_ref.remote(1.0 / nh)
                             for s in eng_r.shards])
            deltas = ray.get([f.set_state_with_delta.remote(href)
                              for f, href in zip(eng_f.shards, hrefs)])
            it += 1
            if sum(deltas) < tolerance * n:
                converged = True
                break
        # both pools hold h at loop exit (engR computed it, engF
        # received it) — collect hubs, then ONE extra half-step on
        # eng_f re-derives the authorities from the final hubs
        ids, hubs = eng_f._collect(np.float64)
        outs = ray.get([s.emit_state_messages.remote()
                        for s in eng_f.shards])
        ss = ray.get([
            eng_f.shards[q].hits_apply.remote(
                [outs[p][q] for p in range(eng_f.P)])
            for q in range(eng_f.P)])
        na = math.sqrt(sum(ss))
        if na > 0.0:
            ray.get([s.pr_scale_state.remote(1.0 / na)
                     for s in eng_f.shards])
        _, auth = eng_f._collect(np.float64)
        return ids, hubs, auth, {"rounds": it, "converged": converged}
    finally:
        eng_f.shutdown()
        eng_r.shutdown()


def label_spread(edges, seeds, num_partitions: int = 8,
                 max_rounds: int = 10, work_dir: str | None = None):
    """Seed-clamped label spreading over the symmetrized edge set —
    the semi-supervised node-classification op. Returns
    (vertex_ids, labels int64 with -1 = never reached, info)."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.label_spread(seeds, max_rounds)
    finally:
        eng.shutdown()


def maximal_matching(edges, num_partitions: int = 8,
                     max_rounds: int = 200,
                     work_dir: str | None = None):
    """Deterministic distributed maximal matching over the symmetrized
    simple graph. Returns (vertex_ids, partner, info); partner = -1
    for unmatched vertices."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.maximal_matching(max_rounds)
    finally:
        eng.shutdown()


def maximal_independent_set(edges, num_partitions: int = 8,
                            max_rounds: int = 200,
                            work_dir: str | None = None):
    """Luby MIS over the symmetrized simple graph. Returns
    (vertex_ids, membership 1/0, info)."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.maximal_independent_set(max_rounds)
    finally:
        eng.shutdown()


def greedy_coloring(edges, num_partitions: int = 8,
                    max_rounds: int = 500,
                    work_dir: str | None = None):
    """Jones-Plassmann coloring of the symmetrized simple graph.
    Returns (vertex_ids, colors, info); adjacent vertices always get
    distinct colors, color count <= maxdegree + 1."""
    eng = GraphEngine.from_edges(edges, num_partitions, work_dir,
                                 symmetrize=True)
    try:
        return eng.greedy_coloring(max_rounds)
    finally:
        eng.shutdown()
