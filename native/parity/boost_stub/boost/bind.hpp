// Minimal boost stub for the parity build (boost is not installed in this
// image). Maps the few boost APIs the reference headers touch onto their
// std:: equivalents; reference semantics are unchanged because none of the
// compiled parity units actually spawn threads.
#pragma once
#include <functional>

namespace boost {
using std::bind;
}

// boost exposes the placeholders at global scope
using std::placeholders::_1;
using std::placeholders::_2;
using std::placeholders::_3;
using std::placeholders::_4;
