// boost::shared_ptr stub on std::shared_ptr (oracle build; boost is not
// installed in this image).
#pragma once
#include <memory>
namespace boost {
using std::make_shared;
using std::shared_ptr;
}  // namespace boost
