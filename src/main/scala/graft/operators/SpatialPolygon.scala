package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Ray-casting point-in-polygon machinery for NON-CONVEX polygons — the
  * general containment test beside the convex half-plane conjunction of
  * `join_spatial_polygon`. Containment = parity of boundary crossings of
  * the +x ray from the point (Shimrat 1962; the PNPOLY formulation), in
  * EXACT integer arithmetic: the edge-intersection compare is the
  * cross-multiplied (px−x1)·(y2−y1) vs (py−y1)·(x2−x1) with the
  * inequality direction following sign(y2−y1) — no division, no floats.
  *
  * Vertex/edge-grazing consistency: the half-open span rule
  * (y1 > py) ≠ (y2 > py) counts an edge only when py lies in
  * [min(y1,y2), max(y1,y2)) — a ray passing exactly through a vertex
  * meets that condition in exactly ONE of the two incident edges, so the
  * parity stays correct (the classic double-count/zero-count failure
  * cannot happen), and a ray collinear with a horizontal edge counts it
  * zero times. Pinned by the grazing cases in SpatialPolygonSpec.
  *
  * Reference behavior: no counterpart in reader; extends the spatial
  * tier's grid candidate machinery (SpatialGrid.scala) to concave
  * geofences, the shape real region joins actually carry. */
object SpatialPolygon {

  /** Number of boundary crossings of the +x ray from (pxCol, pyCol)
    * against the closed polygon whose vertices (array<struct<x,y>>, in
    * boundary order) sit in `vertsCol`. All BIGINT; a fold over the
    * vertex array inside whole-stage codegen — no explode, no shuffle. */
  def rayCrossings(vertsCol: String, pxCol: String, pyCol: String): Column = expr(
    s"""aggregate(
       |  transform(sequence(0, size($vertsCol) - 1), i -> named_struct(
       |    'x1', element_at($vertsCol, i + 1).x,
       |    'y1', element_at($vertsCol, i + 1).y,
       |    'x2', element_at($vertsCol, (i + 1) % size($vertsCol) + 1).x,
       |    'y2', element_at($vertsCol, (i + 1) % size($vertsCol) + 1).y)),
       |  0L,
       |  (acc, e) -> acc + (CASE
       |    WHEN (e.y1 > $pyCol) != (e.y2 > $pyCol) THEN CASE
       |      WHEN e.y2 > e.y1 THEN IF(
       |        ($pxCol - e.x1) * (e.y2 - e.y1) < ($pyCol - e.y1) * (e.x2 - e.x1),
       |        1L, 0L)
       |      ELSE IF(
       |        ($pxCol - e.x1) * (e.y2 - e.y1) > ($pyCol - e.y1) * (e.x2 - e.x1),
       |        1L, 0L)
       |    END
       |    ELSE 0L END))""".stripMargin)

  /** 8-vertex concave star (outer radii wx/wy on the axes, inner radii
    * wx/3, wy/3 on the diagonals), vertices in counter-clockwise boundary
    * order — concave at the four diagonal vertices by construction, never
    * self-intersecting (the polar angle is monotone). Column args are
    * BIGINT center/radii columns. */
  def starVerts(cx0: String, cy0: String, wx: String, wy: String): Column = expr(
    s"""array(
       |  named_struct('x', $cx0 + $wx,         'y', $cy0),
       |  named_struct('x', $cx0 + $wx div 3,   'y', $cy0 + $wy div 3),
       |  named_struct('x', $cx0,               'y', $cy0 + $wy),
       |  named_struct('x', $cx0 - $wx div 3,   'y', $cy0 + $wy div 3),
       |  named_struct('x', $cx0 - $wx,         'y', $cy0),
       |  named_struct('x', $cx0 - $wx div 3,   'y', $cy0 - $wy div 3),
       |  named_struct('x', $cx0,               'y', $cy0 - $wy),
       |  named_struct('x', $cx0 + $wx div 3,   'y', $cy0 - $wy div 3))""".stripMargin)
}
