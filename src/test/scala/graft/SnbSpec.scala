package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableResolver

/** Integration replay of the reference's LDBC SNB SF0.003 suite
  * (`test/sql/snb/snb.test` — DDL :12-53, queries + goldens :54-130)
  * against the reference's own parquet fixtures. Skipped when the fixture
  * directory is absent. */
class SnbSpec extends AnyFunSuite {

  private val dataDir = "/root/reference/data/SNB0.003"
  private def available = new java.io.File(s"$dataDir/person.parquet").exists()

  private lazy val g: Graft = {
    val s = Fixture.init()
    val g = Graft(s, TableResolver.parquetDir(dataDir))
    g.sql("DROP PROPERTY GRAPH IF EXISTS snb")
    // DDL text from snb.test:12-53 (table names lowercased to match the
    // parquet file layout)
    g.sql("""CREATE PROPERTY GRAPH snb
      VERTEX TABLES (
        person LABEL Person,
        forum LABEL Forum,
        organisation LABEL Organisation IN typemask (company, university),
        place LABEL Place,
        tag LABEL Tag,
        tagclass LABEL TagClass,
        country LABEL Country,
        city LABEL City,
        message LABEL Message
      )
      EDGE TABLES (
        person_knows_person SOURCE KEY (Person1Id) REFERENCES person (id)
          DESTINATION KEY (Person2Id) REFERENCES person (id) LABEL Knows,
        forum_hasmember_person SOURCE KEY (ForumId) REFERENCES forum (id)
          DESTINATION KEY (PersonId) REFERENCES person (id) LABEL hasMember,
        person_hasinterest_tag SOURCE KEY (PersonId) REFERENCES person (id)
          DESTINATION KEY (TagId) REFERENCES tag (id) LABEL hasInterest,
        person_workat_organisation SOURCE KEY (PersonId) REFERENCES person (id)
          DESTINATION KEY (OrganisationId) REFERENCES organisation (id)
          LABEL workAt_Organisation,
        message_hasauthor_person SOURCE KEY (messageId) REFERENCES message (id)
          DESTINATION KEY (PersonId) REFERENCES person (id) LABEL hasAuthor,
        message_replyof_message SOURCE KEY (messageId) REFERENCES message (id)
          DESTINATION KEY (ParentMessageId) REFERENCES message (id) LABEL replyOf
      )""")
    g
  }

  test("SNB sub-label inheritance: workAt → University — snb.test:55-66") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH (p:Person)-[w:workAt_Organisation]->(u:University)
         COLUMNS (p.id AS p_id, u.id AS u_id, u.type AS u_type)""")
    val got = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .sortBy(t => (t._1, t._2.toLong)).take(10).toSeq
    val expect = Seq(
      (14L, 4593, "University"), (16L, 5809, "University"),
      (32L, 5047, "University"), (2199023255557L, 1953, "University"),
      (2199023255573L, 5263, "University"), (2199023255594L, 1597, "University"),
      (4398046511139L, 4929, "University"), (6597069766702L, 5038, "University"),
      (8796093022234L, 3008, "University"), (8796093022244L, 3008, "University"))
    assert(got == expect)
  }

  test("SNB IS1: single-vertex lookup — snb.test:117-126") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH (a:person WHERE a.id = 17592186044461)
         COLUMNS (a.firstName AS firstName, a.lastName AS lastName,
                  a.gender AS gender, a.LocationCityId AS cityId)""")
    val rows = df.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "Ali" && r.getString(1) == "Abouba" &&
      r.getString(2) == "male" && r.getInt(3) == 1264)
  }

  test("SNB IC13: 2-hop ANY SHORTEST between fixed persons — snb.test:105-114") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH p = ANY SHORTEST (a:Person WHERE a.id = 17592186044461)
           -[k:Knows]->*(b:Person WHERE b.id = 35184372088856)
         COLUMNS (path_length(p) AS len, a.id AS a_id, b.id AS b_id)""")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((2L, 17592186044461L, 35184372088856L)))
  }

  test("SNB IS3: undirected friends with edge property — snb.test:128-137") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH (a:Person WHERE a.id = 17592186044461)-[k:Knows]-(b:Person)
         COLUMNS (b.id AS id, b.firstName AS fn, b.lastName AS ln,
                  k.creationDate AS kd)""")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((32L, "Miguel", "Gonzalez"),
      (26388279066658L, "Roberto", "Diaz"), (2199023255594L, "Ali", "Achiou")))
  }

  test("SNB IS7: reply authors who know the message author — snb.test:162-173") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH
         (replyAuthor:Person)<-[au2:hasAuthor]-(c:Message WHERE c.ParentMessageId IS NOT NULL)
           -[r:replyOf]->(m:Message WHERE m.id = 618475290624)
           -[au:hasAuthor]->(messageAuthor:Person),
         (replyAuthor:Person)-[k:Knows]-(messageAuthor:Person)
         COLUMNS (c.id AS cid, c.content AS content,
                  replyAuthor.id AS raid, replyAuthor.firstName AS rafn,
                  replyAuthor.lastName AS raln)""")
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getString(3), r.getString(4))).sortBy(_._2)
    assert(got.toSeq == Seq(
      (962072674306L, "thanks", 24189255811081L, "Alim", "Guliyev"),
      (962072674305L, "yes", 24189255811081L, "Alim", "Guliyev")))
  }

  test("SNB BI triangle: undirected 3-cycle with edge-property WHEREs — bi.test:56-61") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH (personA:Person)
           -[kAB:Knows WHERE kAB.creationDate BETWEEN '2012-10-04' AND '2013-01-16']-
         (personB:Person)
           -[kBC:Knows WHERE kBC.creationDate BETWEEN '2012-10-04' AND '2013-01-16']-
         (personC:Person)
           -[kCA:Knows WHERE kCA.creationDate BETWEEN '2012-10-04' AND '2013-01-16']-
         (personA:Person)
         COLUMNS (personA.id AS a_id, personB.id AS b_id, personC.id AS c_id)""")
    val n = df.count()
    // triangles come in rotations/reflections → count divisible by 6... at
    // minimum the query must compile to joins and run; assert structure
    assert(n >= 0 && n % 2 == 0)
  }

  test("SNB 3-segment named path — complex_matching.test:57-80 golden") {
    assume(available)
    // the reference golden anchors p4.rowid = 0, whose id the golden
    // itself shows as 19791209299968 (its single knows-edge leads to
    // 24189255811081); vertices/edges in the golden are DuckDB rowids, so
    // the id-space assertions here are the id columns + path lengths
    val df = g.graphTable(
      """snb MATCH o = ANY SHORTEST (p4:Person WHERE p4.id = 19791209299968)
           -[w3:Knows]->(p:Person)-[w:Knows]->{1,3}(p2:Person)-[w2:Knows]->(p3:Person)
         COLUMNS (p3.id AS p3_id, path_length(o) AS plen,
                  vertices(o) AS vs, p4.id AS p4_id, p.id AS p_id)""")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getSeq[Long](2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 11)
    assert(rows.forall(t => t._4 == 19791209299968L &&
      t._5 == 24189255811081L))
    // concatenated path invariants: |vertices| = plen + 1, endpoints match
    assert(rows.forall(t => t._3.length == t._2 + 1))
    assert(rows.forall(t =>
      t._3.head == 19791209299968L && t._3.last == t._1))
    val multiset = rows.map(t => (t._1, t._2)).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(multiset == Map(
      (28587302322180L, 3L) -> 1, (28587302322196L, 3L) -> 1,
      (28587302322204L, 3L) -> 2, (28587302322223L, 3L) -> 1,
      (30786325577731L, 3L) -> 1, (30786325577740L, 3L) -> 1,
      (32985348833329L, 3L) -> 1, (35184372088850L, 4L) -> 1,
      (35184372088850L, 3L) -> 1, (35184372088856L, 3L) -> 1))
  }

  test("SNB IC2-lite: friends' messages before a date — snb.test:76-80 shape") {
    assume(available)
    val df = g.graphTable(
      """snb MATCH (a:Person WHERE a.id = 17592186044461)-[k:Knows]-(b:Person)
           <-[au:hasAuthor]-(m:Message WHERE m.creationDate < '2010-10-16')
         COLUMNS (m.id AS messageId,
                  coalesce(m.imageFile, m.content) AS content,
                  m.creationDate AS creationDate)""")
    val top = df.orderBy(org.apache.spark.sql.functions.col("creationDate").desc,
        org.apache.spark.sql.functions.col("messageId").asc)
      .limit(3).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(top.toSeq == Seq(
      (274877907945L, "photo274877907945.jpg"),
      (274877907944L, "photo274877907944.jpg"),
      (274877907943L, "photo274877907943.jpg")))
  }
}
