package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN, Ester et al. KDD'96) on 2-D integer
  * point sets — the clustering family k-means structurally can't cover:
  * arbitrary-shape clusters plus an explicit NOISE class, with no k to
  * guess.
  *
  * Distributed formulation: grid-cell blocking. Cells have side = eps, so
  * every eps-neighbor of a point lies in its 3×3 cell neighborhood — the
  * candidate join is an EQUI join on cell id (each point replicated to
  * its 9 probe cells; a candidate pair forms exactly once, in the cell
  * that contains the second point), then an exact integer distance check.
  * Core points (≥ minPts in the closed eps-ball, self included) form the
  * cluster skeleton, CONTRACTED by eps/√2 cells (per-cell star + one
  * witness edge per connected cell pair — component-exact, see inline
  * proof) before closing through driver union-find under the edge gate
  * or [[Graphs.bigStarComponents]] beyond it; border points attach to
  * their minimum core-neighbor label; everything else is noise.
  *
  * Scale (100 TB): every stage is an equi shuffle on cell id or point id
  * — no cartesian anywhere. Candidate volume is N × (9 × cell occupancy);
  * occupancy is density × eps², so eps is a DENSITY knob, not a free
  * constant — callers growing the corpus at fixed coordinate range must
  * shrink eps (see the caller's eps ladder) or occupancy grows linearly
  * and candidates quadratically, the same fixed-parameter rot the LSH
  * plane ladder fixed. The integer coordinate contract keeps the distance
  * check exact and the whole chain SQL-mirrorable (dx² + dy² ≤ eps² in
  * BIGINT — coordinates must stay below ~2^30 so squares fit).
  */
object Density {

  /** DBSCAN over `pts` with columns (id: long-castable, xm: long, ym:
    * long) in integer micro-units. Returns (id, role, cluster):
    * role ∈ core|border|noise; cluster = min point id reachable through
    * the core skeleton, -1 for noise. minPts counts the point ITSELF
    * (the classic definition: |N_eps(p)| ≥ minPts with p ∈ N_eps(p)).
    *
    * Closure routing: core skeletons are FILAMENTS — density-connected
    * chains whose graph diameter grows with cluster extent / eps, the
    * OPPOSITE regime from the quasi-clique near-dup graphs
    * [[Dedup.connectedComponents]]'s diameter-bounded loop was built
    * for (measured: the sf1 customer plane's skeleton blew straight
    * past that loop's 10 rounds). Under `driverMaxEdges` the driver
    * union-find closes it in one pass; above it the closure goes to
    * [[Graphs.bigStarComponents]] — O(log n) rounds regardless of
    * diameter, the correct asymptotics for chain-shaped components. */
  def dbscan(pts: DataFrame, eps: Long, minPts: Int,
      driverMaxEdges: Long = 5000000L): DataFrame = {
    require(eps > 0, s"eps=$eps must be positive")
    require(minPts >= 2, s"minPts=$minPts must be at least 2 (1 makes everything core)")
    val spark = pts.sparkSession
    import spark.implicits._
    val p = Caches.register(pts.select($"id".cast("long").as("id"),
      $"xm".cast("long").as("xm"), $"ym".cast("long").as("ym"),
      floor($"xm" / eps).as("cx"), floor($"ym" / eps).as("cy")))
    // probe side: each point replicated to its 3×3 cell neighborhood;
    // the join hits the build side's HOME cell only, so a pair (a, b)
    // forms exactly once — no distinct needed
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val probes = p.select($"id", $"xm", $"ym",
      explode(array(offsets.map { case (dx, dy) =>
        struct(($"cx" + dx).as("cx"), ($"cy" + dy).as("cy"))
      }: _*)).as("nc"))
      .select($"id", $"xm", $"ym", $"nc.cx".as("cx"), $"nc.cy".as("cy"))
    val d2 = ($"a.xm" - $"b.xm") * ($"a.xm" - $"b.xm") +
      ($"a.ym" - $"b.ym") * ($"a.ym" - $"b.ym")
    // contraction grid for the closure: side s2 ≤ eps/√2, so SAME-CELL
    // points are mutually within eps (cell diagonal ≤ eps) — the cells
    // carry through the neighbor join below at two extra longs per row
    val s2 = math.max(1L, (eps.toDouble / math.sqrt(2.0)).toLong)
    // directed neighbor list (both directions present by symmetry of the
    // probe construction): id's eps-ball contents, excluding id itself
    val nbr = Caches.register(probes.as("a").join(p.as("b"),
        $"a.cx" === $"b.cx" && $"a.cy" === $"b.cy" && $"a.id" =!= $"b.id" &&
          d2 <= lit(eps * eps))
      .select($"a.id".as("id"), $"b.id".as("nb"),
        floor($"a.xm" / s2).as("gxa"), floor($"a.ym" / s2).as("gya"),
        floor($"b.xm" / s2).as("gxb"), floor($"b.ym" / s2).as("gyb")))
    val cores = Caches.register(nbr.groupBy($"id")
      .agg(count(lit(1)).as("deg"))
      .filter($"deg" >= minPts - 1) // self counts toward minPts
      .select($"id"))
    // CONTRACTED core skeleton: dense regions make the raw core-core
    // graph quadratic in cell occupancy (every in-ball pair is an edge)
    // AND filament-shaped (diameter ∝ cluster extent / eps) — the worst
    // case for any closure. Same-s2-cell cores are mutually within eps,
    // so (a) a star from each cell's min core to its cell-mates replaces
    // the within-cell clique, and (b) ONE witness edge per connected
    // cell pair — (repr_a, repr_b) for any core pair (a, b) within eps
    // across cells — replaces the cross-cell bundle: a–repr_a and
    // b–repr_b are real edges, so skeleton connectivity EQUALS core-graph
    // connectivity (components, and hence min-id labels, are identical;
    // DensitySpec pins this against both closure paths). Edge count
    // drops from Σ occupancy² to ~(cores + occupied cell pairs) ∝ N.
    val coreCell = Caches.register(p.join(cores, "id")
      .select($"id", floor($"xm" / s2).as("gx"), floor($"ym" / s2).as("gy")))
    val cellMin = Caches.register(coreCell.groupBy($"gx", $"gy")
      .agg(min($"id").as("repr")))
    val starEdges = coreCell.join(cellMin, Seq("gx", "gy"))
      .filter($"id" =!= $"repr")
      .select($"repr".as("id_a"), $"id".as("id_b"))
    val crossEdges = nbr
      .join(cores, "id").join(cores.select($"id".as("nb")), "nb")
      .filter($"id" < $"nb" && ($"gxa" =!= $"gxb" || $"gya" =!= $"gyb"))
      .select($"gxa", $"gya", $"gxb", $"gyb").distinct()
      .join(cellMin.select($"gx".as("gxa"), $"gy".as("gya"), $"repr".as("id_a")),
        Seq("gxa", "gya"))
      .join(cellMin.select($"gx".as("gxb"), $"gy".as("gyb"), $"repr".as("id_b")),
        Seq("gxb", "gyb"))
      .select($"id_a", $"id_b")
    // materialized once (count is then free) to route by size: driver
    // union-find under the gate, star contraction beyond it — NOT the
    // min-label loop: even contracted, a skeleton of cell-chains keeps
    // diameter ∝ extent/eps, only O(log n) rounds are safe at scale
    val skeleton = starEdges.unionByName(crossEdges).localCheckpoint()
    val linked = (if (skeleton.count() <= driverMaxEdges)
        Dedup.connectedComponents(skeleton, driverMaxEdges = math.max(driverMaxEdges, 1L))
      else Graphs.bigStarComponents(skeleton))
      .select($"id", $"label".as("cluster"))
    // isolated cores (≥ minPts border/noise neighbors, no core neighbor):
    // singleton clusters labeled by their own id
    val coreLbl = Caches.register(cores
      .join(linked, Seq("id"), "left")
      .select($"id", coalesce($"cluster", $"id").as("cluster")))
    // border: non-core in some core's eps-ball; min core label (the
    // deterministic resolution of DBSCAN's border-assignment tie)
    val border = nbr.join(coreLbl.select($"id".as("nb"), $"cluster"), "nb")
      .join(cores, Seq("id"), "left_anti")
      .groupBy($"id").agg(min($"cluster").as("cluster"))
    val coreOut = coreLbl.select($"id", lit("core").as("role"), $"cluster")
    val borderOut = border.select($"id", lit("border").as("role"), $"cluster")
    val noiseOut = p.select($"id")
      .join(coreOut.select($"id").unionAll(borderOut.select($"id")), Seq("id"), "left_anti")
      .select($"id", lit("noise").as("role"), lit(-1L).as("cluster"))
    coreOut.unionByName(borderOut).unionByName(noiseOut)
  }
}
