// Minimal boost::thread stub for the parity build — see bind.hpp.
#pragma once
#include <condition_variable>
#include <functional>
#include <mutex>
#include <thread>

#include "bind.hpp"

namespace boost {
using thread = std::thread;
using mutex = std::mutex;
template <class T>
using unique_lock = std::unique_lock<T>;
using condition_variable = std::condition_variable;
template <class T>
using function = std::function<T>;
}
