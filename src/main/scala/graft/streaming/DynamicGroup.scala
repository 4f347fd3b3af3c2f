package graft.streaming

/** `dynamic_group` (reference `interp.rs:3901`, `_with_store` 3942): a
  * keyed collection of per-key sub-computations with explicit lifecycle —
  * in Spark, per-key STATE is the per-key sub-graph, and add/del are state
  * create/remove (the SURVEY §2.11 mapping). Runs in both RunModes via
  * [[BurstProc]].
  *
  * Event protocol on the shared keyed stream (`Ev.src`):
  *   - Add (1): create the key's sub-state via `factory` (idempotent);
  *   - Data (0): fold into the key's state via `onTick`, emit its output —
  *     IGNORED for keys never added (no sub-graph exists yet);
  *   - Del (2): `onRemove` sees the final state and may emit a last tick
  *     (marked `v2 = 1`), then the state is dropped; a later Add starts
  *     fresh. Deterministic per-key order = (ts, seq), like the reference's
  *     BTreeMap iteration order guarantee.
  */
object DynamicGroup {

  val Data = 0
  val Add = 1
  val Del = 2

  def proc[S](factory: () => S, onTick: (S, Double) => (S, Double),
      onRemove: S => Option[Double]): BurstProc[Option[S]] = new BurstProc[Option[S]] {
    def init(): Option[S] = None
    def onBurst(st: Option[S], key: String, ts: Long, evs: Seq[Ev]): (Option[S], Seq[Out]) = {
      var s = st
      val out = Seq.newBuilder[Out]
      evs.foreach { ev =>
        ev.src match {
          case Add =>
            if (s.isEmpty) s = Some(factory())
          case Data =>
            s = s.map { cur =>
              val (s2, v) = onTick(cur, ev.value)
              out += Out(key, ts, v, 0.0)
              s2
            }
          case Del =>
            s.foreach(cur => onRemove(cur).foreach(v => out += Out(key, ts, v, 1.0)))
            s = None
          case _ => ()
        }
      }
      (s, out.result())
    }
  }
}
