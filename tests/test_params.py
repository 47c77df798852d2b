"""Configuration-layer tests.

Port of the reference's ParametersHandler test matrix
(`src/ParametersHandler/tests/ParametersHandlerTest.cpp:25-117`) plus the YARP
`.ini` backend coverage (`ParametersHandlerYarpTest.cpp`, fixtures
`src/ParametersHandler/tests/config.ini`, `src/Estimators/tests/config.ini`).
"""

import numpy as np
import pytest

from blf_tpu.utils.params import IniHandler, ParametersHandler, StdHandler, parse_ini


@pytest.fixture
def handler():
    h = StdHandler()
    h.set_parameter("answer_to_the_ultimate_question_of_life", 42)
    h.set_parameter("pi", 3.14)
    h.set_parameter("Fibonacci Numbers", [1, 1, 2, 3, 5, 8, 13, 21])
    h.set_parameter("John", "Smith")
    return h


class TestGetParameters:
    # ParametersHandlerTest.cpp:36-41 "Get integer"
    def test_get_integer(self, handler):
        assert handler.get_parameter("answer_to_the_ultimate_question_of_life", int) == 42

    # ParametersHandlerTest.cpp:43-48 "Get Double"
    def test_get_double(self, handler):
        assert handler.get_parameter("pi", float) == 3.14

    # ParametersHandlerTest.cpp:50-55 "Get String"
    def test_get_string(self, handler):
        assert handler.get_parameter("John", str) == "Smith"

    # ParametersHandlerTest.cpp:57-64 "Get Vector"
    def test_get_vector(self, handler):
        assert handler.get_vector("Fibonacci Numbers", int) == [1, 1, 2, 3, 5, 8, 13, 21]

    def test_get_array(self, handler):
        np.testing.assert_array_equal(
            handler.get_array("Fibonacci Numbers"),
            np.array([1, 1, 2, 3, 5, 8, 13, 21], dtype=np.float64),
        )

    # missing key is an explicit error (StdImplementation.tpp:23-29)
    def test_missing_key_raises(self, handler):
        with pytest.raises(KeyError):
            handler.get_parameter("nonexistent")

    # type mismatch is an explicit error (any_cast failure)
    def test_type_mismatch_raises(self, handler):
        with pytest.raises(TypeError):
            handler.get_parameter("John", int)
        with pytest.raises(TypeError):
            handler.get_parameter("pi", str)
        with pytest.raises(TypeError):
            handler.get_parameter("pi", int)  # non-integral float
        with pytest.raises(TypeError):
            handler.get_vector("pi")  # scalar requested as vector

    def test_int_promotes_to_float(self, handler):
        v = handler.get_parameter("answer_to_the_ultimate_question_of_life", float)
        assert v == 42.0 and isinstance(v, float)

    def test_bool_is_not_int(self):
        h = StdHandler({"flag": True})
        assert h.get_parameter("flag", bool) is True
        with pytest.raises(TypeError):
            h.get_parameter("flag", int)


class TestGroups:
    # ParametersHandlerTest.cpp:66-80 "Set/Get Group"
    def test_set_get_group(self, handler):
        group = StdHandler()
        handler.set_group("CARTOONS", group)
        gh = handler.get_group("CARTOONS")
        gh.set_parameter("Donald's nephews", ["Huey", "Dewey", "Louie"])
        assert gh.get_vector("Donald's nephews", str) == ["Huey", "Dewey", "Louie"]

    # groups are shared by reference (StdImplementation stores shared_ptr)
    def test_group_shared_by_reference(self, handler):
        group = StdHandler()
        handler.set_group("CARTOONS", group)
        group.set_parameter("John", "Doe")
        assert handler.get_group("CARTOONS").get_parameter("John", str) == "Doe"

    # ParametersHandlerTest.cpp:82-96 "is Empty"
    def test_is_empty(self, handler):
        group = StdHandler()
        handler.set_group("CARTOONS", group)
        assert handler.get_group("CARTOONS").is_empty()
        group.set_parameter("Donald's nephews", ["Huey", "Dewey", "Louie"])
        assert not handler.get_group("CARTOONS").is_empty()

    def test_missing_group_raises(self, handler):
        with pytest.raises(KeyError):
            handler.get_group("MISSING")

    def test_nested_groups(self):
        h = StdHandler({"a": {"b": {"deep": 7}}})
        assert h.get_group("a").get_group("b").get_parameter("deep", int) == 7


class TestLifecycle:
    # ParametersHandlerTest.cpp:98-102 "Print content"
    def test_to_string(self, handler):
        s = handler.to_string()
        assert "pi" in s and "John" in s

    # ParametersHandlerTest.cpp:104-112 "Set from object"
    def test_set_from_object(self, handler):
        handler.update({"value": 10})
        assert handler.get_parameter("value", int) == 10

    # ParametersHandlerTest.cpp:114-119 "Clear"
    def test_clear(self, handler):
        assert not handler.is_empty()
        handler.clear()
        assert handler.is_empty()


class TestIniBackend:
    # src/Estimators/tests/config.ini — the RLS fixture, parsed verbatim
    RLS_INI = """\
lambda                  1.0
measurement_covariance (0.5, 0.5)
state                  (0.0, 0.0)
state_covariance       (10.0, 10.0)
"""

    # src/ParametersHandler/tests/config.ini — groups + quoted keys/values
    GROUP_INI = """\
answer_to_the_ultimate_question_of_life 42
pi                                      3.14
John                                    Smith
"Fibonacci Numbers"                     (1, 1, 2, 3, 5, 8, 13, 21)

[CARTOONS]
"Donald's nephews"                      ("Huey", "Dewey", "Louie")
Fibonacci_Numbers                       (1, 1, 2, 3, 5, 8, 13, 21)
John                                    Doe
"""

    def test_rls_fixture(self):
        h = IniHandler.from_string(self.RLS_INI)
        assert h.get_parameter("lambda", float) == 1.0
        assert h.get_vector("measurement_covariance", float) == [0.5, 0.5]
        assert h.get_vector("state", float) == [0.0, 0.0]
        assert h.get_vector("state_covariance", float) == [10.0, 10.0]

    def test_group_fixture(self):
        h = IniHandler.from_string(self.GROUP_INI)
        assert h.get_parameter("answer_to_the_ultimate_question_of_life", int) == 42
        assert h.get_parameter("pi", float) == 3.14
        assert h.get_parameter("John", str) == "Smith"
        assert h.get_vector("Fibonacci Numbers", int) == [1, 1, 2, 3, 5, 8, 13, 21]
        g = h.get_group("CARTOONS")
        assert g.get_vector("Donald's nephews", str) == ["Huey", "Dewey", "Louie"]
        assert g.get_parameter("John", str) == "Doe"  # shadows the root key

    def test_comments_and_bools(self):
        h = IniHandler.from_string(
            "// comment\nenabled true\ndisabled false\n# another\nn 3\n"
        )
        assert h.get_parameter("enabled", bool) is True
        assert h.get_parameter("disabled", bool) is False
        assert h.get_parameter("n", int) == 3

    def test_parse_ini_returns_plain_dict(self):
        d = parse_ini(self.GROUP_INI)
        assert d["CARTOONS"]["John"] == "Doe"


class TestInitializeProtocol:
    """The universal component-init idiom (SURVEY.md §3.5): components read their
    static parameters out of a handler (or a named group) at construction."""

    def test_component_reads_group(self):
        h = ParametersHandler(
            {"CONTACT": {"length": 0.12, "width": 0.09, "spring_coeff": 2000.0,
                         "damper_coeff": 100.0}}
        )
        g = h.get_group("CONTACT")
        assert g.get_parameter("spring_coeff", float) == 2000.0
        with pytest.raises(KeyError):
            g.get_parameter("missing_param", float)
