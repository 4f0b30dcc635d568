package graft

import org.scalatest.funsuite.AnyFunSuite

/** SUITE-LEVEL census of the ENTIRE reference test tree — the closure
  * above the per-suite censuses: every `*Test*.java` under any module's
  * src/test is adjudicated into exactly one of six classes, so "what
  * fraction of the reference's tests is accounted for" has a pinned,
  * mechanically-checked answer at the FILE level.
  *
  *  - census   — full-file/ per-method censused by a named spec
  *               (ValidatorCensusSpec, SqlOperatorCensusSpec,
  *               TpcdsCensusSpec, the .iq censuses, Materialization/
  *               Stream censuses)
  *  - carried  — behavior carried by named specs/operators without a
  *               per-method ledger (the evidence names the carrier)
  *  - harness  — test infrastructure with no assertions of its own
  *  - internal — Calcite-internal machinery Spark supplies differently
  *               (Volcano/Hep, Rex IR, linq4j/enumerable codegen, type
  *               factory, util libraries, plan-string goldens)
  *  - adapter  — out-of-scope external-system adapters (Druid, ES,
  *               Mongo, Cassandra, Geode, Kafka, Pig, Splunk, babel,
  *               os/file/example)
  *  - jdbc     — Avatica/JDBC server surface (documented exclusion)
  *
  * Mechanics: the reference tree is WALKED AT TEST TIME; the ledger
  * must cover exactly the discovered file set (no unadjudicated file,
  * no stale entry), and every census/carried evidence string naming a
  * graft spec must resolve to a real file in src/test.
  */
class SuiteCensusSpec extends AnyFunSuite {

  private val refRoot = java.nio.file.Paths.get("/root/reference")

  private lazy val refTestFiles: Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    java.nio.file.Files.walk(refRoot).forEach { p =>
      val s = refRoot.relativize(p).toString
      if (s.endsWith(".java") && s.contains("/test/") &&
          p.getFileName.toString.contains("Test"))
        out += s
    }
    out.toSet
  }

  private val ledger: Map[String, (String, String)] = Map(
    "babel/src/test/java/org/apache/calcite/test/BabelParserTest.java" -> ("adapter", "babel adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "babel/src/test/java/org/apache/calcite/test/BabelQuidemTest.java" -> ("adapter", "babel adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "babel/src/test/java/org/apache/calcite/test/BabelTest.java" -> ("adapter", "babel adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "cassandra/src/test/java/org/apache/calcite/test/AbstractCassandraAdapterTest.java" -> ("adapter", "cassandra adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "cassandra/src/test/java/org/apache/calcite/test/CassandraAdapterDataTypesTest.java" -> ("adapter", "cassandra adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "cassandra/src/test/java/org/apache/calcite/test/CassandraAdapterTest.java" -> ("adapter", "cassandra adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/adapter/clone/ArrayTableTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/adapter/enumerable/PhysTypeTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/adapter/enumerable/TypeFinderTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/jdbc/CalciteRemoteDriverTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/jdbc/JavaTypeFactoryTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/materialize/LatticeSuggesterTest.java" -> ("carried", "plans/MaterializedViews suggester behaviors (MvAdviceFixSpec)"),
    "core/src/test/java/org/apache/calcite/plan/RelOptPlanReaderTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/RelOptUtilTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/RelTraitTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/RelWriterTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/CollationConversionTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/ComboRuleTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/PlannerTests.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/plan/volcano/TraitConversionTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/TraitPropagationTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/VolcanoPlannerTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/plan/volcano/VolcanoPlannerTraitTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/prepare/LookupOperatorOverloadsTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/profile/ProfilerTest.java" -> ("carried", "plans/Profiler + profile_* registry queries (distributions, FDs, sketches)"),
    "core/src/test/java/org/apache/calcite/rel/RelCollationTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rel/RelDistributionTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rel/logical/ToLogicalConverterTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rel/rel2sql/RelToSqlConverterStructsTest.java" -> ("carried", "plans/RelToSql struct handling (nested-struct dialect rows)"),
    "core/src/test/java/org/apache/calcite/rel/rel2sql/RelToSqlConverterTest.java" -> ("carried", "plans/RelToSql — 21 dialects, two-way cycle census + 140-case differential fuzz"),
    "core/src/test/java/org/apache/calcite/rel/rules/DateRangeRulesTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rel/rules/EnumerableLimitRuleTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rel/rules/SortRemoveRuleTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rex/RexBuilderTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rex/RexExecutorTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/rex/RexSqlStandardConvertletTableTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/runtime/AutomatonTest.java" -> ("carried", "operators/MatchRecognize NFA behaviors (pattern quantifiers through the census)"),
    "core/src/test/java/org/apache/calcite/runtime/BinarySearchTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/runtime/DeterministicAutomatonTest.java" -> ("carried", "operators/MatchRecognize NFA behaviors (DFA minimization is internal)"),
    "core/src/test/java/org/apache/calcite/runtime/EnumerablesTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/SqlSetOptionOperatorTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/parser/SqlParserTest.java" -> ("internal", "Calcite parser/unparser internals — Spark's parser is the engine's front end (injected grammars excepted)"),
    "core/src/test/java/org/apache/calcite/sql/parser/SqlUnParserTest.java" -> ("internal", "Calcite parser/unparser internals — Spark's parser is the engine's front end (injected grammars excepted)"),
    "core/src/test/java/org/apache/calcite/sql/parser/parserextensiontesting/ExtensionSqlParserTest.java" -> ("internal", "Calcite parser/unparser internals — Spark's parser is the engine's front end (injected grammars excepted)"),
    "core/src/test/java/org/apache/calcite/sql/test/AbstractSqlTester.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/test/DocumentationTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlAdvisorTest.java" -> ("carried", "SqlAdvisorSpec — completion hints over the catalog"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlOperatorBaseTest.java" -> ("census", "SqlOperatorCensusSpec — 262 methods = 250 ported + 12 non-portable, citation-checked"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlOperatorTest.java" -> ("carried", "runner of SqlOperatorBaseTest against the strict tester — same census (SqlOperatorCensusSpec)"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlPrettyWriterTest.java" -> ("carried", "plans/RelToSql rendering (pretty-writing is a dialect concern carried there)"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlRuntimeTester.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlTestFactory.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlTester.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlTests.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlTypeNameTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/test/SqlValidatorTester.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/sql/type/RelDataTypeSystemTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/type/SqlTypeFactoryTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/type/SqlTypeUtilTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/sql/validate/LexCaseSensitiveTest.java" -> ("internal", "Lex/quoting knob matrix — same exclusion class as the validator census's lex rows"),
    "core/src/test/java/org/apache/calcite/sql/validate/LexEscapeTest.java" -> ("internal", "Lex/quoting knob matrix — same exclusion class as the validator census's lex rows"),
    "core/src/test/java/org/apache/calcite/sql/validate/SqlValidatorUtilTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/CalciteResourceTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/CalciteSqlOperatorTest.java" -> ("carried", "runner of SqlOperatorBaseTest against the runtime tester — same census"),
    "core/src/test/java/org/apache/calcite/test/CollectionTypeTest.java" -> ("carried", "array/map/struct collection queries across iq censuses + tranche 21 collection casts"),
    "core/src/test/java/org/apache/calcite/test/CoreQuidemTest.java" -> ("census", "the 18 core .iq full-file censuses (src/test/scala/graft/iq, SmallIqSpecs) + 7 adjudicated non-portable scripts"),
    "core/src/test/java/org/apache/calcite/test/DiffTestCase.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/ExceptionMessageTest.java" -> ("carried", "rejection-message fragments pinned across ValidatorParity tranches"),
    "core/src/test/java/org/apache/calcite/test/FilteratorTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/FoodmartTest.java" -> ("carried", "operators/FoodMart corpus + FoodMart MDX construct-family census (COVERAGE.md r13)"),
    "core/src/test/java/org/apache/calcite/test/HepPlannerTest.java" -> ("internal", "optimizer-rule plan goldens — Catalyst's optimizer supplies this layer (documented Volcano-rebuild exclusion)"),
    "core/src/test/java/org/apache/calcite/test/InduceGroupingTypeTest.java" -> ("carried", "GROUPING SETS/ROLLUP/CUBE machinery (agg censuses; bit-set induction is internal)"),
    "core/src/test/java/org/apache/calcite/test/InterpreterTest.java" -> ("internal", "the row interpreter — documented out-of-scope (standing exclusion; Tungsten is the row engine)"),
    "core/src/test/java/org/apache/calcite/test/JdbcAdapterTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/JdbcFrontJdbcBackLinqMiddleTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/JdbcFrontJdbcBackTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/JdbcFrontLinqBackTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/JdbcTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/LatticeTest.java" -> ("carried", "plans/MaterializedViews lattices + MV registry queries"),
    "core/src/test/java/org/apache/calcite/test/LinqFrontJdbcBackTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/MaterializationTest.java" -> ("census", "MaterializationParitySpec census — 124 materialize + 28 no-materialize ported, 15 documented rejects"),
    "core/src/test/java/org/apache/calcite/test/ModelTest.java" -> ("carried", "sources/ModelFile + ModelFileSpec (model-JSON schemas, lattices)"),
    "core/src/test/java/org/apache/calcite/test/MultiJdbcSchemaJoinTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/MutableRelTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/PigRelBuilderTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/QuidemTest.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/ReflectiveSchemaTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/RelBuilderTest.java" -> ("carried", "Rel.scala RelBuilder DSL (scan/filter/project/agg/join/sort surface + RelSpec)"),
    "core/src/test/java/org/apache/calcite/test/RelMdColumnOriginsTest.java" -> ("carried", "plans/ColumnOrigins + tranche 23's testFieldOrigin port"),
    "core/src/test/java/org/apache/calcite/test/RelMdPercentageOriginalRowsTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/RelMetadataTest.java" -> ("carried", "plans/PlanMetadata + ColumnOrigins + Profiler carry the metadata PLANE (§4.3); Calcite's handler-dispatch internals are Catalyst's job"),
    "core/src/test/java/org/apache/calcite/test/RelOptRulesTest.java" -> ("internal", "optimizer-rule plan goldens — Catalyst's optimizer supplies this layer (documented Volcano-rebuild exclusion)"),
    "core/src/test/java/org/apache/calcite/test/RelOptTestBase.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/RexImplicationCheckerTest.java" -> ("carried", "plans/MaterializedViews range-subsumption implication (RebuildSpjSpec)"),
    "core/src/test/java/org/apache/calcite/test/RexProgramTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/RexShuttleTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/RexTransformerTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/ScannableTableTest.java" -> ("carried", "sources/* table scans with filter pushdown (PLANS.md PushedFilters pins)"),
    "core/src/test/java/org/apache/calcite/test/SlowTests.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/SqlAdvisorJdbcTest.java" -> ("carried", "SqlAdvisorSpec (the advisor surface; its JDBC wrapper is Avatica, out of scope)"),
    "core/src/test/java/org/apache/calcite/test/SqlFunctionsTest.java" -> ("carried", "FunctionParitySpec3 — runtime function families value-ported"),
    "core/src/test/java/org/apache/calcite/test/SqlJsonFunctionsTest.java" -> ("carried", "FunctionParitySpec2/10/11 + JsonModes — JSON behavior matrix value-ported"),
    "core/src/test/java/org/apache/calcite/test/SqlLimitsTest.java" -> ("carried", "FunctionParitySpec4 — CAST overflow/boundary families value-ported"),
    "core/src/test/java/org/apache/calcite/test/SqlLineTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/SqlOperatorBindingTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/SqlStatisticProviderTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/SqlTestGen.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/SqlToRelConverterExtendedTest.java" -> ("internal", "sql-to-rel plan-string goldens — Catalyst's analyzer is the converter; the SEMANTICS are carried by the oracle suite"),
    "core/src/test/java/org/apache/calcite/test/SqlToRelConverterTest.java" -> ("internal", "sql-to-rel plan-string goldens — Catalyst's analyzer is the converter; the SEMANTICS are carried by the oracle suite"),
    "core/src/test/java/org/apache/calcite/test/SqlToRelTestBase.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/SqlValidatorDynamicTest.java" -> ("carried", "EXTEND/schema-on-query dynamic columns (ExtendSql, SchemaOnRead)"),
    "core/src/test/java/org/apache/calcite/test/SqlValidatorFeatureTest.java" -> ("internal", "Calcite feature-flag validator errors — same knob class as the validator census's conformance exclusions"),
    "core/src/test/java/org/apache/calcite/test/SqlValidatorMatchTest.java" -> ("carried", "ValidatorParitySpec12 MATCH_RECOGNIZE validation-scope tranche + MatchRecognize censuses"),
    "core/src/test/java/org/apache/calcite/test/SqlValidatorTest.java" -> ("census", "ValidatorCensusSpec — 426 methods = 298 ported + 128 non-portable, citation-checked"),
    "core/src/test/java/org/apache/calcite/test/SqlValidatorTestCase.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/StreamTest.java" -> ("census", "StreamingSpec + StreamSql censuses — stream.md goldens through SELECT STREAM, stream==batch equivalence"),
    "core/src/test/java/org/apache/calcite/test/TableFunctionTest.java" -> ("carried", "lateral/table-function surface (lateral_posexplode, UNNEST censuses)"),
    "core/src/test/java/org/apache/calcite/test/TableInRootSchemaTest.java" -> ("jdbc", "Avatica/JDBC connection surface — documented out-of-scope (SURVEY exclusions)"),
    "core/src/test/java/org/apache/calcite/test/TypeCoercionConverterTest.java" -> ("carried", "same coercion cells — converter plan strings are Calcite-internal"),
    "core/src/test/java/org/apache/calcite/test/TypeCoercionTest.java" -> ("carried", "coercion cells pinned across ValidatorParity/FunctionParity tranches (implicit-coercion divergences documented)"),
    "core/src/test/java/org/apache/calcite/test/UdfTest.java" -> ("carried", "functions/* UDF pack + §2.5 codegen Expressions (UDF/UDAF/UDTF registry queries)"),
    "core/src/test/java/org/apache/calcite/test/UdtTest.java" -> ("carried", "TableDdlSql CREATE TYPE + TypeIqCensusSpec"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestCommand.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestCommandExecutor.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestCommandGenerator.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestCommandScript.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestPlugin.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestPluginCommand.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/concurrent/ConcurrentTestTimedCommandGenerator.java" -> ("harness", "concurrent-test command framework — harness, no assertions of its own"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableBatchNestedLoopJoinTest.java" -> ("carried", "join-algorithm semantics carried by join.iq/outer.iq censuses + PLANS.md physical-join pins; the enumerable operator internals are Catalyst's"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableCorrelateTest.java" -> ("carried", "correlate/lateral semantics carried by lateral.iq census + lateral_posexplode; enumerable internals are Catalyst's"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableHashJoinTest.java" -> ("carried", "join-algorithm semantics carried by join.iq/outer.iq censuses + PLANS.md physical-join pins; the enumerable operator internals are Catalyst's"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableJoinTest.java" -> ("carried", "join-algorithm semantics carried by join.iq/outer.iq censuses + PLANS.md physical-join pins; the enumerable operator internals are Catalyst's"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableRepeatUnionHierarchyTest.java" -> ("carried", "operators/Recursive closure queries (hierarchy fixpoints)"),
    "core/src/test/java/org/apache/calcite/test/enumerable/EnumerableRepeatUnionTest.java" -> ("carried", "operators/Recursive + recursive_* registry queries (native WITH RECURSIVE twins)"),
    "core/src/test/java/org/apache/calcite/test/fuzzer/RexProgramFuzzyTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/test/fuzzer/RexToTestCodeShuttle.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/tools/FrameworksTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/tools/PlannerTest.java" -> ("internal", "Calcite planner/IR/type-system internals (Volcano/Hep, Rex*, traits, metadata, enumerable codegen) — Catalyst/Tungsten supply this layer"),
    "core/src/test/java/org/apache/calcite/util/BitSetsTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/ChunkListTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/ImmutableBitSetTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/PartiallyOrderedSetTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/PermutationTestCase.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/PrecedenceClimbingParserTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/ReflectVisitorTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/SourceTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/TestUtil.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/util/TestUtilTest.java" -> ("harness", "test harness/infrastructure — no assertions of its own"),
    "core/src/test/java/org/apache/calcite/util/UtilTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/graph/DirectedGraphTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "core/src/test/java/org/apache/calcite/util/mapping/MappingTest.java" -> ("internal", "Calcite utility-library unit test (bitsets, graphs, parsing utils) — Spark/Scala supply these libraries"),
    "druid/src/test/java/org/apache/calcite/adapter/druid/DruidQueryFilterTest.java" -> ("adapter", "druid adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "druid/src/test/java/org/apache/calcite/test/DruidDateRangeRulesTest.java" -> ("adapter", "druid adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/AggregationTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/BooleanLogicTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/ElasticSearchAdapterTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/ElasticsearchJsonTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/ElasticsearchVersionTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/Projection2Test.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/ProjectionTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/QueryBuildersTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "elasticsearch/src/test/java/org/apache/calcite/adapter/elasticsearch/ScrollingTest.java" -> ("adapter", "elasticsearch adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "example/csv/src/test/java/org/apache/calcite/test/CsvTest.java" -> ("adapter", "example CSV/function adapter — documented out-of-scope sample code"),
    "example/function/src/test/java/org/apache/calcite/test/ExampleFunctionTest.java" -> ("adapter", "example CSV/function adapter — documented out-of-scope sample code"),
    "file/src/test/java/org/apache/calcite/adapter/file/FileReaderTest.java" -> ("adapter", "file/web-scrape adapter — documented out-of-scope; file FORMATS are carried by sources/*"),
    "file/src/test/java/org/apache/calcite/adapter/file/SqlTest.java" -> ("adapter", "file/web-scrape adapter — documented out-of-scope; file FORMATS are carried by sources/*"),
    "geode/src/test/java/org/apache/calcite/adapter/geode/rel/AbstractGeodeTest.java" -> ("adapter", "geode adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "geode/src/test/java/org/apache/calcite/adapter/geode/rel/GeodeAllDataTypesTest.java" -> ("adapter", "geode adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "geode/src/test/java/org/apache/calcite/adapter/geode/rel/GeodeBookstoreTest.java" -> ("adapter", "geode adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "geode/src/test/java/org/apache/calcite/adapter/geode/rel/GeodeZipsTest.java" -> ("adapter", "geode adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "geode/src/test/java/org/apache/calcite/adapter/geode/simple/BookMasterRegionTest.java" -> ("adapter", "geode adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "kafka/src/test/java/org/apache/calcite/adapter/kafka/KafkaAdapterTest.java" -> ("adapter", "kafka adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "kafka/src/test/java/org/apache/calcite/adapter/kafka/KafkaRowConverterTest.java" -> ("adapter", "kafka adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/MemoryEnumerableTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/function/FunctionTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/BlockBuilderTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/CorrelateJoinTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/DeterministicTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/ExpressionTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/InlinerTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/JoinPreserveOrderTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/Linq4jTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/LookupImplTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/OptimizerTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/test/PrimitiveTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "linq4j/src/test/java/org/apache/calcite/linq4j/tree/TypeTest.java" -> ("internal", "linq4j expression-tree engine — Spark supplies execution via Catalyst/Tungsten codegen"),
    "mongodb/src/test/java/org/apache/calcite/adapter/mongodb/MongoAdapterTest.java" -> ("adapter", "mongodb adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "pig/src/test/java/org/apache/calcite/test/AbstractPigTest.java" -> ("adapter", "pig adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "pig/src/test/java/org/apache/calcite/test/PigAdapterTest.java" -> ("adapter", "pig adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "pig/src/test/java/org/apache/calcite/test/PigRelBuilderStyleTest.java" -> ("adapter", "pig adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "piglet/src/test/java/org/apache/calcite/test/PigRelExTest.java" -> ("adapter", "piglet adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "piglet/src/test/java/org/apache/calcite/test/PigRelOpTest.java" -> ("adapter", "piglet adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "piglet/src/test/java/org/apache/calcite/test/PigRelTestBase.java" -> ("adapter", "piglet adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "piglet/src/test/java/org/apache/calcite/test/PigScriptTest.java" -> ("adapter", "piglet adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "piglet/src/test/java/org/apache/calcite/test/PigletTest.java" -> ("adapter", "piglet adapter — documented out-of-scope external-system adapter (SURVEY exclusions)"),
    "plus/src/test/java/org/apache/calcite/adapter/os/OsAdapterTest.java" -> ("adapter", "os-command adapter — documented out-of-scope"),
    "plus/src/test/java/org/apache/calcite/adapter/tpcds/TpcdsTest.java" -> ("census", "TpcdsCensusSpec — all 99 TPC-DS structures carried or subsumed; Tpcds.scala carriers"),
    "plus/src/test/java/org/apache/calcite/adapter/tpch/TpchTest.java" -> ("census", "Tpch.scala — the full 22-query TPC-H corpus, oracle-exact, benched per round"),
    "plus/src/test/java/org/apache/calcite/chinook/EndToEndTest.java" -> ("jdbc", "Chinook remote-JDBC fixtures — Avatica surface, documented out-of-scope"),
    "plus/src/test/java/org/apache/calcite/chinook/RemotePreparedStatementParametersTest.java" -> ("jdbc", "Chinook remote-JDBC fixtures — Avatica surface, documented out-of-scope"),
    "plus/src/test/java/org/apache/calcite/materialize/TpcdsLatticeSuggesterTest.java" -> ("carried", "plans/MaterializedViews lattice suggester + MvAdviceFixSpec (LatticeSuggester behaviors)"),
    "server/src/test/java/org/apache/calcite/test/ServerParserTest.java" -> ("jdbc", "Avatica SQL server parser/unparser plumbing — server DDL SEMANTICS are carried by TableDdlSql/ServerIqCensusSpecs"),
    "server/src/test/java/org/apache/calcite/test/ServerQuidemTest.java" -> ("census", "ServerIqCensusSpecs + MvIqCensusSpec — all 6 server .iq scripts full-file censused"),
    "server/src/test/java/org/apache/calcite/test/ServerTest.java" -> ("jdbc", "Avatica SQL server parser/unparser plumbing — server DDL SEMANTICS are carried by TableDdlSql/ServerIqCensusSpecs"),
    "server/src/test/java/org/apache/calcite/test/ServerUnParserTest.java" -> ("jdbc", "Avatica SQL server parser/unparser plumbing — server DDL SEMANTICS are carried by TableDdlSql/ServerIqCensusSpecs"),
    "spark/src/test/java/org/apache/calcite/test/SparkAdapterTest.java" -> ("internal", "Calcite's own Spark RDD adapter — the ENTIRE engine here is Spark-native"),
    "splunk/src/test/java/org/apache/calcite/test/SplunkAdapterTest.java" -> ("adapter", "splunk adapter — documented out-of-scope external-system adapter (SURVEY exclusions)")
  )

  test("census: the ledger covers the reference test tree exactly") {
    val missing = refTestFiles -- ledger.keySet
    val stale = ledger.keySet -- refTestFiles
    assert(missing.isEmpty, s"unadjudicated reference test files: ${missing.toSeq.sorted.take(10)}")
    assert(stale.isEmpty, s"stale ledger entries: ${stale.toSeq.sorted.take(10)}")
    assert(refTestFiles.size == 208,
      s"reference test-file count changed: ${refTestFiles.size}")
    val byCat = ledger.values.groupBy(_._1).view.mapValues(_.size).toMap
    info(s"reference test tree: ${refTestFiles.size} files = " +
      byCat.toSeq.sortBy(-_._2).map { case (c, n) => s"$n $c" }.mkString(" + "))
  }

  test("census: every named graft census spec exists") {
    val specNames = """(\w+CensusSpecs?|\w+ParitySpec\d*|SmallIqSpecs)""".r
    val named = ledger.values.flatMap(v => specNames.findAllIn(v._2)).toSet
    // a named spec must exist as a CLASS somewhere under src/test (some
    // files hold several census classes, e.g. ServerIqCensusSpecs.scala)
    lazy val testSources = {
      def walk(dir: java.io.File): Seq[java.io.File] = {
        val fs = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
        fs.filter(f => f.isFile && f.getName.endsWith(".scala")) ++
          fs.filter(_.isDirectory).flatMap(walk)
      }
      walk(new java.io.File("src/test/scala"))
        .map(f => java.nio.file.Files.readString(f.toPath)).mkString("\n")
    }
    val missing = named.filterNot(n =>
      new java.io.File(s"src/test/scala/graft/$n.scala").exists ||
        testSources.contains(s"class $n"))
    assert(missing.isEmpty, s"evidence names unknown specs: $missing")
  }

  test("census: category vocabulary is closed") {
    val cats = ledger.values.map(_._1).toSet
    assert(cats == Set("census", "carried", "harness", "internal", "adapter", "jdbc"),
      s"unexpected categories: $cats")
  }
}
