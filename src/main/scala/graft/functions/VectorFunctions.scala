package graft.functions

import org.apache.spark.sql.Column

/** Public wrappers for the native codegen vector kernels (implementation in
  * org.apache.spark.sql.graft — they need private[sql] Catalyst types). */
object VectorFunctions {
  def dotF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.dotF(a, b)
  def cosineF(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.cosineF(a, b)
  def hyperplaneSig(vec: Column, planes: Array[Double], dim: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.hyperplaneSig(vec, planes, dim)
  def nearestCentroid(vec: Column, centroids: Array[Double], dim: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.nearestCentroid(vec, centroids, dim)
  def nearestCentroidL(vec: Column, centroids: Array[Long], dim: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.nearestCentroidL(vec, centroids, dim)
  def centroidSqDistL(vec: Column, centroids: Array[Long], dim: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.centroidSqDistL(vec, centroids, dim)
}
