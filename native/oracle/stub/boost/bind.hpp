// Minimal boost stub for the oracle build (boost is not installed in this
// image). Maps the few boost APIs the reference headers touch onto their
// std:: equivalents.
#pragma once
#include <functional>
#include <type_traits>

namespace boost {
using std::bind;
}

// boost exposes the placeholders at global scope
using std::placeholders::_1;
using std::placeholders::_2;
using std::placeholders::_3;
using std::placeholders::_4;

// Boost.Bind supports composing bind expressions with relational operators
// (`bind(f,_1) < bind(g,_2)` makes a comparator — used by
// Reprojector.cpp:129). std::bind invocations ignore surplus arguments, so
// forwarding the full pack to both sides reproduces boost's placeholder
// semantics.
template <class B1, class B2,
          typename std::enable_if<std::is_bind_expression<B1>::value &&
                                      std::is_bind_expression<B2>::value,
                                  int>::type = 0>
auto operator<(const B1& b1, const B2& b2) {
  return [b1, b2](const auto&... xs) { return b1(xs...) < b2(xs...); };
}
