// boost::thread stub on std::thread for the oracle build. The oracle runs
// the reference in linearizeOperation (sequential) mode, but FullSystem's
// constructor DOES spawn the mapping thread and IndexThreadReduce spawns
// its 6 workers — std::thread provides real threads, so the semantics are
// the reference's own.
#pragma once
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>

#include "bind.hpp"
#include "shared_ptr.hpp"

namespace boost {
using thread = std::thread;
using mutex = std::mutex;
template <class T>
using unique_lock = std::unique_lock<T>;
using condition_variable = std::condition_variable;
template <class T>
using function = std::function<T>;
}  // namespace boost
