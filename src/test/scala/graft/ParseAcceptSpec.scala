package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rel.SqlParser
import graft.expr.ParseException

/** Parse-accept corpus from the reference's SQL parser tests
  * (/root/reference/rel/parse_sql_test.go): every statement the
  * reference parses must parse here; its malformed statements must
  * raise. Parse-only — several reference unknown functions (terms,
  * todate variants) resolve at build time, not parse time, exactly like
  * the reference's registry lookup.
  */
class ParseAcceptSpec extends AnyFunSuite {

  private def parses(sql: String): Unit = {
    val p = new SqlParser(graft.expr.Lexer.lex(sql))
    p.parseStatement()
    p.parseEnd()
  }
  private def fails(sql: String): Unit =
    assertThrows[Exception] {
      val p = new SqlParser(graft.expr.Lexer.lex(sql))
      p.parseStatement()
      p.parseEnd()
    }

  private val good = Seq(
    """SELECT exists(firstname), x FROM user""",
    """SELECT exists(firstname), x -- lets use the user table
      |FROM user -- a comment
      |WHERE x = y;""".stripMargin,
    """SELECT terms(repository.description) FROM github_member GROUP BY repository.language, author""",
    """select @@version_comment limit 7""",
    """select repository.name, respository.language, repository.stargazers
      |FROM github_fork
      |WHERE eq(repository.name,"dataux") AND repository.language = "go"
      |  AND repository.name NOT LIKE "docker"""".stripMargin,
    """select user_id, email FROM mockcsv.users
      |WHERE user_id in (select user_id from mockcsv.orders)""".stripMargin,
    """select avg(char_length(title)) from article""",
    """select gh.repository.name, gh.id, gp.date
      |FROM github_fork as gh
      |INNER JOIN github_push AS gp ON gp.repo_id = gh.repo_id
      |WHERE gh.repository.language = "go"""".stripMargin,
    """select u.fname, u.lname, u.userid, b.description
      |FROM user as u INNER JOIN blog AS b
      |  ON b.first_name = u.fname AND b.last_name = u.lname""".stripMargin,
    """SELECT t1.name, t2.salary, t3.price
      |FROM employee AS t1
      |INNER JOIN info AS t2 ON t1.name = t2.name
      |INNER JOIN orders AS t3 ON t3.id = t2.fake_id;""".stripMargin,
    """SET @@local.sort_buffer_size=10000;""",
    """SELECT id, name FROM user ALIAS user_query""",
    """upsert into users (id, str) values (0, 'a')""",
    """UPDATE users SET name = "was_updated", [deleted] = true WHERE id = "user815"""",
    """DROP TABLE articles;""",
    """SELECT id, name FROM user WITH key = "value", keyint = 45, keybool = true, keyfloat = 45.5""",
    """SHOW FULL TABLES FROM `temp_schema` LIKE '%'""",
    """SHOW CREATE TABLE `temp_schema`.`users`""",
    """SELECT form_track_form AS form_track_form, `from` AS `from` FROM user""",
    """SELECT COUNT(*) AS count FROM providers WHERE (`providers._id` != NULL)""",
    """select title from article WITH distributed=true, node_ct=10""",
    """SELECT `appearances`.`G_ph` AS `field` FROM `appearances`
      |ORDER BY `appearances`.`G_ph` ASC LIMIT 500 OFFSET 0""".stripMargin,
    """SHOW FULL COLUMNS FROM `tablex` FROM `dbx` LIKE '%';""",
    """show keys from `appearances` from `baseball`""",
    """show indexes from `appearances` from `baseball`""",
    """select url, `_nmob`, `_cc`, `_uida` from events123
      |WHERE exists(url) LIMIT 500 WITH distributed = true;""".stripMargin,
    """select `repository.full_name` from `github_public`
      |ORDER BY `respository.full_name` asc, TOINT(`fieldname`) DESC limit 100;""".stripMargin,
    """select name from `github_public` limit 0, 100;""",
    """select `actor.id`, `actor.login` from github_watch where `actor.id` < 1000""",
    """USE `myschema`;""",
    """EXPLAIN EXTENDED SELECT actor FROM github_watch WHERE repository.language = "go"""",
    // --- second pass over rel/parse_sql_test.go: previously unported ---
    """show session status like "ssl_cipher"""",
    """DESCRIBE mytable""",
    """CREATE SOURCE mysource;""",
    """CREATE OR REPLACE VIEW viewx
      |AS SELECT a, b FROM mydb.tbl
      |WITH stuff = "hello";""".stripMargin,
    """CREATE schema IF NOT EXISTS github_archive WITH {
      |  "type":"elasticsearch",
      |  "schema":"github_archive",
      |  "hosts": ["http://127.0.0.1:9200"]
      |};""".stripMargin,
    """show tables""",
    """show tables LIKE "user%";""",
    """show databases""",
    """SHOW VARIABLES""",
    """SHOW GLOBAL VARIABLES like '%'""",
    """select *, @@var_name from movies""",
    """select *, toint(a_field) AS ti from movies""",
    """select *, 12 AS twelve from movies""",
    """select toint(a_field) AS ti, * from movies""",
    """select 3, director from movies""",
    """select director, year from movies where year BETWEEN 2000 AND 2010;""",
    """select director, year from movies where director like 'Quentin'""",
    """select director, year from movies where !exists(user_id) OR toint(not_a_field) > 21""",
    """select count(*) from user;   """,
    """select name from movies where director IN ("Quentin","copola","Bay","another")""",
    """select id, name from users LIMIT 100 OFFSET 1000""",
    """SELECT count(*), email FROM users WHERE emaildomain(email) = "gmail.com" GROUP BY email WITH distributed = true;""",
    """SELECT
      |    lol AS notlol IF hey == 0
      |FROM nothing
      |WHERE this != that;""".stripMargin,
    """SELECT
      |    lol AS notlol IF AND (
      |            or (
      |                event IN ("rq", "ab"),
      |                NOT EXISTS event
      |            )
      |            product IN ("my", "app")
      |        )
      |FROM nothing
      |WHERE this != that;""".stripMargin,
    """PREPARE stmt1 FROM 'SELECT toint(field) + 4 AS field FROM table1';""",
    """insert into mytable (id, str) values (0, "a"),(1,"b");""",
    """SELECT LAST_INSERT_ID();""",
    """SELECT CHARSET();""",
    """SELECT DATABASE()""",
    """rollback""",
    """set autocommit""",
    """SELECT id, name FROM user
      |WITH {
      |  "key":"value2"
      |  ,"keyint":45,
      |  "keyfloat":55.5,
      |  "keybool": true,
      |  "keyarraymixed":["a",2,"b"],
      |  "keyarrayobj":[
      |    {"hello":"value","age":55},
      |    {"hello":"value","age":55}
      |  ],
      |  "keyobj":{"hello":"value","age":55},
      |  "keyobjnested":{
      |    "hello":"value",
      |    "array":[
      |      "a",
      |      2,
      |      "b"
      |    ]
      |  }
      |}""".stripMargin,
    """CREATE TABLE articles
      |  (
      |   ID int(11) NOT NULL AUTO_INCREMENT,
      |   Email char(150) NOT NULL DEFAULT '' COMMENT "email hello",
      |   PRIMARY KEY (ID),
      |   CONSTRAINT emails_fk FOREIGN KEY (Email) REFERENCES Emails (Email) COMMENT "hello constraint"
      | ) ENGINE=InnoDB AUTO_INCREMENT=4080 DEFAULT CHARSET=utf8
      |WITH stuff = "hello";""".stripMargin,
    // r11 surface
    """SELECT a FROM t WHERE x > ANY (SELECT y FROM u)""",
    """SELECT a FROM t WHERE x <= ALL (SELECT y FROM u) AND x != SOME (SELECT z FROM v)""",
    """SELECT count(*) FILTER (WHERE x > 1) AS n, sum(y) FILTER (WHERE z == "a") AS s FROM t GROUP BY g""",
    """SELECT a, row_number() OVER w AS rk FROM t WINDOW w AS (PARTITION BY b ORDER BY c DESC)""",
    """SELECT a FROM t WINDOW w AS (ORDER BY c) QUALIFY row_number() OVER w == 1""",
    """SELECT a FROM t QUALIFY rank() OVER (PARTITION BY b ORDER BY c) <= 3""",
    """SELECT a FROM t WHERE x IS DISTINCT FROM y AND z IS NOT DISTINCT FROM NULL""",
    """SELECT EXTRACT(YEAR FROM ts) AS y, extract(ts, "%Y") AS ys, try_cast(a AS bigint) AS n FROM t""",
    """SELECT a FROM t TABLESAMPLE (2.5 PERCENT) ON (id)""",
    """SELECT a FROM t TABLESAMPLE (25 PERCENT) ON (id) JOIN u ON t.id = u.id""")

  private val bad = Seq(
    """SELECT "hello" LIMIT "5x"""", // limit must be an integer
    """SELECT x FROM user WHERE ex(a,b""", // unbalanced paren
    """SELECT x FROM user GROUP BY ex(a,b""",
    """SELECT x FROM user ORDER BY ex(a,;""",
    """SELECT a, b INTO FROM user;""", // INTO needs a target
    """SELECT x FROM user GROUP BY x HAVING ct > count(x,;""",
    """SELECT x FROM user OFFSET "hello";""", // offset must be an integer
    """SELECT x FROM user WITH "hello";""", // WITH needs k=v or {json}
    """SELECT x FROM user ALIAS 12;""", // alias must be an identity
    """SELECT hash(a,,) AS id, `z` FROM nothing;""", // empty arg
    """INSERT "a"""",
    """INSERT INTO 12""",
    """insert into mytable (id, str;""",
    """CREATE TABLE t (a int) ENGINE=""", // dangling option value
    """SELECT hash(join(, """, // nested unbalanced
    // unknown keyword SORT must fail (rel/parse_sql_test.go:402)
    """select `repository.name` from github_fork SORT BY `repository.stargazers_count` DESC limit 3""",
    // a qualified JOIN with no ON must be refused, not silently cross-joined
    // (rel/parse_sql.go:1264-1291); CROSS JOIN / comma-FROM stay legal
    """SELECT a FROM t1 LEFT JOIN t2 WHERE t1.x = 1""",
    """SELECT a FROM t1 INNER JOIN t2 LIMIT 5""",
    // r11 surface: malformed forms raise, never mis-parse
    """SELECT upper(a) FILTER (WHERE true) FROM t""", // FILTER needs an aggregate
    """SELECT a FROM t WHERE x IS DISTINCT y""", // missing FROM
    """SELECT a, row_number() OVER w AS rk FROM t""", // unknown window name
    """SELECT a FROM t WINDOW w AS (ORDER BY c), w AS (ORDER BY d)""", // duplicate
    """SELECT a FROM t TABLESAMPLE (25 PERCENT)""", // ON key is mandatory
    """SELECT a FROM t TABLESAMPLE (200 PERCENT) ON (id)""") // out of range

  test("modern-dialect syntax: accepted shapes parse, malformed ones raise") {
    parses("SELECT a, row_number() OVER (PARTITION BY b ORDER BY c DESC) AS rk FROM t")
    parses("SELECT a FROM t QUALIFY a > 1 ORDER BY a")
    parses("WITH x AS (SELECT 1 AS a), y AS (SELECT a FROM x) SELECT a FROM y")
    parses("SELECT CASE WHEN a > 1 THEN 2 ELSE 3 END AS v FROM t")
    parses("SELECT CASE a WHEN 1 THEN \"one\" END AS v FROM t")
    parses("SELECT a, count(*) AS n FROM t GROUP BY ROLLUP(a)")
    parses("SELECT a, count(*) AS n FROM t GROUP BY CUBE(a, b)")
    parses("SELECT a FROM t WHERE a > (SELECT max(a) FROM t)")
    fails("SELECT a OVER (ORDER BY b) FROM t")          // OVER without a function
    fails("SELECT row_number() OVER PARTITION BY b FROM t") // missing parens
    fails("SELECT CASE WHEN a THEN 1 FROM t")           // unclosed CASE
    fails("SELECT CASE END FROM t")                     // no WHEN branch
    fails("WITH x (SELECT 1) SELECT 1")                 // missing AS
    fails("WITH x AS SELECT 1 SELECT 1")                // missing parens
    parses("WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT r.n + 1 FROM r WHERE r.n < 5) SELECT n FROM r")
    parses("WITH x(a, b) AS (SELECT 1, 2) SELECT a FROM x") // CTE column list
    parses("WITH recursive AS (SELECT 1 AS a) SELECT a FROM recursive") // soft keyword
    fails("WITH RECURSIVE r() AS (SELECT 1) SELECT 1")  // empty column list
    parses("SELECT c.a FROM c SEMI JOIN o ON c.a == o.a")
    parses("SELECT c.a FROM c LEFT ANTI JOIN o ON c.a == o.a")
    fails("SELECT c.a FROM c SEMI JOIN o")              // SEMI needs ON
    parses("SELECT t.a FROM (VALUES (1, \"x\"), (2, \"y\")) AS t(a, b)")
    fails("SELECT t.a FROM (VALUES (1, 2)) AS t")       // VALUES needs t(cols)
    fails("SELECT a FROM (VALUES (1, 2), (3)) AS t(a, b)") // ragged arity
    parses("SELECT DISTINCT ON (k) k, v FROM t ORDER BY k, v")
    parses("SELECT * EXCLUDE (a, b) FROM t")
    parses("SELECT * REPLACE (x + 1 AS x) EXCLUDE (y) FROM t") // either order
    fails("SELECT * EXCLUDE () FROM t")                 // empty modifier list
    parses("SELECT a, b FROM t GROUP BY ALL")
    parses("SELECT a, b FROM t ORDER BY ALL DESC")
    parses("SELECT a, count(*) AS n FROM t GROUP BY 1 ORDER BY 2")
    fails("SELECT a FROM t ORDER BY 2")                 // ordinal out of range
    fails("SELECT a FROM t GROUP BY 0")                 // ordinals are 1-based
    parses("SELECT a FROM t ASOF JOIN u ON t.k == u.k AND t.ts >= u.ts")
    parses("SELECT a FROM t ASOF LEFT JOIN u ON t.k == u.k AND t.ts >= u.ts")
    fails("SELECT a FROM t ASOF JOIN u")                 // ASOF needs ON
    parses("SELECT a FROM t, LATERAL (SELECT b FROM u WHERE u.k == t.k) l")
    parses("SELECT a FROM t CROSS JOIN LATERAL (SELECT b FROM u WHERE u.k == t.k) AS l")
    fails("SELECT a FROM t, LATERAL u")                 // LATERAL needs (subquery)
    parses("MERGE INTO t USING d ON t.k == d.k WHEN MATCHED THEN UPDATE SET v = d.v WHEN NOT MATCHED THEN INSERT (k, v) VALUES (d.k, d.v)")
    parses("MERGE INTO t USING (SELECT k FROM s) AS d ON t.k == d.k WHEN MATCHED THEN DELETE")
    fails("MERGE INTO t USING d ON t.k == d.k")         // no WHEN clause
    fails("MERGE INTO t USING d ON t.k == d.k WHEN NOT MATCHED THEN DELETE") // NOT MATCHED can only INSERT
    fails("MERGE INTO t USING d ON t.k == d.k WHEN MATCHED THEN INSERT (k) VALUES (1)") // MATCHED cannot INSERT
    fails("SELECT a FROM t GROUP BY ROLLUP a")          // ROLLUP needs parens
  }

  test("CROSS JOIN and comma-FROM still parse without ON") {
    parses("""SELECT a FROM t1 CROSS JOIN t2""")
    parses("""SELECT a FROM t1, t2 WHERE t1.x = t2.x""")
  }

  test("reference parser corpus: every valid statement parses") {
    for (s <- good) {
      try parses(s)
      catch {
        case e: Exception => fail(s"should parse: $s\n  -> ${e.getMessage}")
      }
    }
  }

  test("reference parser corpus: malformed statements raise") {
    for (s <- bad) fails(s)
  }

  // FilterQL statements from rel/parse_filterql_test.go. Not ported:
  // hex INCLUDE names starting with a digit (3d4240…) — our lexer
  // requires identifiers to start with a letter/underscore.
  private val filterGood = Seq(
    """FILTER "bob@gmail.com" IN ("hello","world")""",
    """FILTER "bob@gmail.com" NOT IN ("hello","world")""",
    """FILTER "bob@gmail.com" IN identityname""",
    """FILTER "\"Boost\"" == identityname""",
    """FILTER email CONTAINS "gmail.com"""",
    """FILTER NOT INCLUDE ffe5817811c2270aa5d4aff2d9eafed3""",
    """FILTER AND ( NOT news INTERSECTS ("a"), domains intersects ("b"))""",
    """FILTER email INTERSECTS ("a", "b")""",
    """FILTER email NOT INTERSECTS ("a", "b")""",
    """FILTER AND ( NOT INCLUDE abcd, (lastvisit_ts > "now-1M") ) FROM user""",
    """FILTER COMPANY IN ("Toys R"" Us", "Toys R' Us, Inc.")""",
    """FILTER x > 7""",
    """FILTER AND ( NOT EXISTS email, email NOT IN ("abc") )""",
    """FILTER AND ( score NOT BETWEEN 5 and 10, email NOT IN ("abc") )""",
    """FILTER NOT AND ( name == "bob" ) ALIAS root""",
    """FILTER NOT (name == "bob") ALIAS root""",
    """FILTER OR ( INCLUDE child_1, INCLUDE child_2 ) ALIAS root""",
    """FILTER NOT AND ( name == "bob", OR ( NOT INCLUDE filter_xyz , NOT exists abc ) ) ALIAS root""",
    """FILTER AND ( INCLUDE child_1, INCLUDE child_2 ) ALIAS root""",
    """FILTER NOT INCLUDE child_1 ALIAS root""",
    "FILTER EXISTS email ALIAS `Has Spaces Alias`")

  test("reference FilterQL corpus parses") {
    for (s <- filterGood) {
      try parses(s)
      catch {
        case e: Exception => fail(s"should parse: $s\n  -> ${e.getMessage}")
      }
    }
  }
}
