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
  * cluster skeleton; the core-core adjacency closes through
  * [[Dedup.connectedComponents]] (driver union-find under its edge gate,
  * distributed min-label loop beyond it); border points attach to their
  * minimum core-neighbor label; everything else is noise.
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
    * (the classic definition: |N_eps(p)| ≥ minPts with p ∈ N_eps(p)). */
  def dbscan(pts: DataFrame, eps: Long, minPts: Int): DataFrame = {
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
    // directed neighbor list (both directions present by symmetry of the
    // probe construction): id's eps-ball contents, excluding id itself
    val nbr = Caches.register(probes.as("a").join(p.as("b"),
        $"a.cx" === $"b.cx" && $"a.cy" === $"b.cy" && $"a.id" =!= $"b.id" &&
          d2 <= lit(eps * eps))
      .select($"a.id".as("id"), $"b.id".as("nb")))
    val cores = Caches.register(nbr.groupBy($"id")
      .agg(count(lit(1)).as("deg"))
      .filter($"deg" >= minPts - 1) // self counts toward minPts
      .select($"id"))
    // core skeleton closure: undirected core-core edges, min-id labels
    val coreEdges = nbr
      .join(cores, "id").join(cores.select($"id".as("nb")), "nb")
      .filter($"id" < $"nb")
      .select($"id".as("id_a"), $"nb".as("id_b"))
    val linked = Dedup.connectedComponents(coreEdges)
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
