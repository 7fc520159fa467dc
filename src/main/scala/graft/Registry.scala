package graft

/** Central inventory of every operator the engine exposes through the
  * driver contract. Each family object contributes its QueryDefs; SparkEntry
  * derives `queries` / `oracleSql` from here.
  */
object Registry {
  def all: Seq[QueryDef] =
    operators.Relational.defs ++
      operators.Joins.defs ++
      operators.SetOps.defs ++
      operators.Windows.defs ++
      operators.TextOps.defs ++
      operators.Dedup.defs ++
      operators.Components.defs ++
      operators.LinkRank.defs ++
      operators.Similarity.defs ++
      operators.Functions2.defs ++
      operators.Bucketing.defs ++
      operators.Sampling.defs ++
      operators.Multimodal.defs ++
      operators.Formats.defs ++
      operators.ScaleOps.defs ++
      operators.Maintenance.defs ++
      operators.ScaleDiag.defs ++
      operators.CorpusBuild.defs ++
      streaming.EventStream.defs ++
      health.HealthQueries.defs

  lazy val byName: Map[String, QueryDef] = all.map(d => d.name -> d).toMap
}
